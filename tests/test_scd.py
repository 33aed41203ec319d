"""SCD2 merge semantics (operators/scd.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.scd import scd2_merge

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 6, 1)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, seg string, valid_from timestamp, valid_to timestamp"
    )


def _upd(spark, rows):
    return spark.createDataFrame(rows, "k long, seg string, eff_ts timestamp")


def test_change_closes_and_opens(spark):
    dim = _dim(spark, [(1, "A", T0, None)])
    upd = _upd(spark, [(1, "B", T1)])
    out = scd2_merge(dim, upd, "k", ["seg"]).orderBy("valid_from").collect()
    assert [(r["seg"], r["valid_to"]) for r in out] == [("A", T1), ("B", None)]


def test_unchanged_update_is_noop_and_idempotent(spark):
    dim = _dim(spark, [(1, "A", T0, None), (2, "B", T0, None)])
    upd = _upd(spark, [(1, "A", T1), (2, "C", T1)])
    once = scd2_merge(dim, upd, "k", ["seg"])
    assert once.where((F.col("k") == 1)).count() == 1  # no new version for k=1
    # re-applying the same batch changes nothing
    twice = scd2_merge(once, upd, "k", ["seg"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_new_key_and_closed_history_preserved(spark):
    hist_close = dt.datetime(2023, 6, 1)
    dim = _dim(spark, [(1, "OLD", dt.datetime(2023, 1, 1), hist_close),
                       (1, "A", hist_close, None)])
    upd = _upd(spark, [(9, "NEW", T1)])
    out = scd2_merge(dim, upd, "k", ["seg"])
    assert out.count() == 3
    new = out.where(F.col("k") == 9).collect()[0]
    assert new["seg"] == "NEW" and new["valid_from"] == T1 and new["valid_to"] is None
    # untouched closed row still present
    assert out.where((F.col("k") == 1) & F.col("valid_to").isNotNull()).count() == 1
