"""Interval join [EXT]: correctness vs naive join + plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacamp_etl_spark.operators.rangejoin import interval_join


def _left(spark):
    rows = [
        (1, 10, "2024-01-01 00:10:00"),
        (2, 10, "2024-01-01 05:30:00"),
        (3, 20, "2024-01-01 05:30:00"),   # right user, wrong key window
        (4, 10, "2024-01-03 00:00:00"),   # no interval
        (5, 30, "2024-01-01 23:59:59"),   # end-of-bin boundary
    ]
    return spark.createDataFrame(
        rows, "id long, k long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def _right(spark):
    rows = [
        (100, 10, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
        (101, 10, "2024-01-01 05:00:00", "2024-01-01 06:00:00"),
        (102, 30, "2024-01-01 20:00:00", "2024-01-02 04:00:00"),  # spans bins
        (103, 20, "2024-01-02 00:00:00", "2024-01-02 00:00:00"),  # empty
    ]
    return spark.createDataFrame(
        rows, "rid long, k long, start string, end string"
    ).select(
        "rid", "k", F.to_timestamp("start").alias("start"),
        F.to_timestamp("end").alias("end"),
    )


def _naive(spark):
    l, r = _left(spark), _right(spark)
    return (
        l.join(r.withColumnRenamed("k", "rk"),
               (F.col("k") == F.col("rk"))
               & (F.col("ts") >= F.col("start"))
               & (F.col("ts") < F.col("end")))
        .select("id", "rid")
    )


@pytest.mark.parametrize("bin_width", ["1 hour", "6 hours", "1 day"])
def test_inner_matches_naive_at_any_bin_width(spark, bin_width):
    got = interval_join(
        _left(spark), _right(spark),
        left_ts="ts", right_start="start", right_end="end",
        on="k", bin_width=bin_width,
    ).select("id", "rid")
    expect = sorted(map(tuple, _naive(spark).collect()))
    assert sorted(map(tuple, got.collect())) == expect
    assert expect == [(1, 100), (2, 101), (5, 102)]


def test_multi_bin_interval_matches_once(spark):
    """Interval 102 spans two 1-day bins; row 5 must match exactly
    once (a left row lives in one bin — no dedup needed)."""
    got = interval_join(
        _left(spark), _right(spark),
        left_ts="ts", right_start="start", right_end="end",
        on="k", bin_width="1 day",
    ).where(F.col("id") == 5)
    assert [(r["id"], r["rid"]) for r in got.collect()] == [(5, 102)]


def test_left_join_pads_unmatched(spark):
    got = interval_join(
        _left(spark), _right(spark),
        left_ts="ts", right_start="start", right_end="end",
        on="k", bin_width="1 hour", how="left", left_id="id",
    )
    rows = {r["id"]: r["rid"] for r in got.collect()}
    assert rows == {1: 100, 2: 101, 5: 102, 3: None, 4: None}
    # equi-key survives on unmatched rows (not NULLed)
    ks = {r["id"]: r["k"] for r in got.collect()}
    assert ks[3] == 20 and ks[4] == 10


def test_left_requires_left_id(spark):
    with pytest.raises(ValueError, match="left_id"):
        interval_join(
            _left(spark), _right(spark),
            left_ts="ts", right_start="start", right_end="end", how="left",
        )


def test_no_key_interval_join(spark):
    """Pure containment (no equi-key): bins alone bound candidates."""
    got = interval_join(
        _left(spark).drop("k"), _right(spark).drop("k"),
        left_ts="ts", right_start="start", right_end="end",
        bin_width="1 hour",
    ).select("id", "rid")
    # without the key, time-only containment also pairs (2,101)'s
    # same-window neighbor row 3
    assert sorted(map(tuple, got.collect())) == [
        (1, 100), (2, 101), (3, 101), (5, 102),
    ]


def test_plan_has_no_nested_loop(spark):
    df = interval_join(
        _left(spark), _right(spark),
        left_ts="ts", right_start="start", right_end="end",
        on="k", bin_width="1 hour",
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
