"""Time-series gapfill + LOCF [EXT]."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.timeseries import gapfill_counts, locf, time_bucket


def _ev(spark):
    rows = [
        (1, "2024-01-01 00:10:00", "a", 10.0),
        (2, "2024-01-01 00:40:00", "a", 20.0),
        # 01:00 and 02:00 gaps for a
        (3, "2024-01-01 03:15:00", "a", 30.0),
        (4, "2024-01-01 00:30:00", "b", 1.0),
        (5, "2024-01-01 03:45:00", "b", 2.0),
    ]
    return spark.createDataFrame(
        rows, "id long, ts string, k string, v double"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_time_bucket_aligns_to_hour(spark):
    out = _ev(spark).select(time_bucket("ts", "1 hour").alias("b")).distinct()
    got = sorted(str(r["b"]) for r in out.collect())
    assert got == [
        "2024-01-01 00:00:00", "2024-01-01 03:00:00",
    ]


def test_gapfill_dense_and_zero_filled(spark):
    out = gapfill_counts(_ev(spark), "ts", ["k"], width="1 hour")
    rows = {(r["k"], str(r["bucket"])): r["n"] for r in out.collect()}
    # 4 buckets (00..03) x 2 groups = dense spine
    assert len(rows) == 8
    assert rows[("a", "2024-01-01 00:00:00")] == 2
    assert rows[("a", "2024-01-01 01:00:00")] == 0
    assert rows[("a", "2024-01-01 02:00:00")] == 0
    assert rows[("a", "2024-01-01 03:00:00")] == 1
    assert rows[("b", "2024-01-01 01:00:00")] == 0


def test_gapfill_custom_agg_and_locf(spark):
    dense = gapfill_counts(
        _ev(spark), "ts", ["k"], width="1 hour",
        agg={"v_sum": F.sum("v")},
    )
    filled = locf(dense, ["k"], "bucket", ["v_sum"])
    rows = {(r["k"], str(r["bucket"])): r["v_sum"] for r in filled.collect()}
    assert rows[("a", "2024-01-01 00:00:00")] == 30.0
    # gap buckets carry forward the last observed sum
    assert rows[("a", "2024-01-01 01:00:00")] == 30.0
    assert rows[("a", "2024-01-01 02:00:00")] == 30.0
    assert rows[("a", "2024-01-01 03:00:00")] == 30.0
    assert rows[("b", "2024-01-01 02:00:00")] == 1.0


def test_locf_leading_nulls_stay_null(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 5.0), ("a", 3, None)],
        "k string, o long, v double",
    )
    out = {r["o"]: r["v"] for r in locf(df, ["k"], "o", ["v"]).collect()}
    assert out == {1: None, 2: 5.0, 3: 5.0}


def test_gapfill_spine_broadcasts_bounds(spark):
    df = gapfill_counts(_ev(spark), "ts", ["k"], width="1 hour")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
