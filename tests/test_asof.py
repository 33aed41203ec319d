"""As-of join [EXT]: row-atomicity of carried values (ADVICE r1)."""

from __future__ import annotations

import pytest

from datacamp_etl_spark.operators.asof import asof_join


def test_carried_values_come_from_one_right_row(spark):
    """If the winning (latest) right row has NULL in one carried
    column, that NULL must be carried as-is — NOT back-filled from an
    older right row (per-column last(ignorenulls) would mix rows)."""
    left = spark.createDataFrame([(1, 100)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 50, "old_px", "old_src"), (1, 90, None, "new_src")],
        "k long, rts long, px string, src string",
    )
    out = asof_join(
        left,
        right,
        on="k",
        left_ts="lts",
        right_ts="rts",
        right_cols=["px", "src"],
        tiebreak="rts",
    ).collect()
    assert len(out) == 1
    row = out[0]
    # latest right row (rts=90) wins atomically: px is its NULL,
    # not the older row's 'old_px'
    assert row["src"] == "new_src"
    assert row["px"] is None


def test_no_prior_right_row_yields_nulls(spark):
    left = spark.createDataFrame([(1, 10)], "k long, lts long")
    right = spark.createDataFrame([(1, 50, "x")], "k long, rts long, px string")
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_cols=["px"], tiebreak="rts",
    ).collect()
    assert out[0]["px"] is None


def test_empty_right_cols_raises(spark):
    left = spark.createDataFrame([(1, 10)], "k long, lts long")
    right = spark.createDataFrame([(1, 5, "x")], "k long, rts long, px string")
    with pytest.raises(ValueError, match="right_cols"):
        asof_join(
            left, right, on="k", left_ts="lts", right_ts="rts", right_cols=[]
        )
