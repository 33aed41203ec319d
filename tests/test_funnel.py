"""Funnel + cohort-retention semantics (operators/funnel.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.funnel import (
    cohort_retention,
    funnel,
    funnel_counts,
)


def _events(spark, rows):
    return spark.createDataFrame(
        [(u, t, dt.datetime(2024, 1, d, h)) for u, t, d, h in rows],
        "user_id long, event_type string, ts timestamp",
    )


def _steps():
    # built lazily: Column exprs need an active SparkContext
    return [
        ("signup", F.col("event_type") == "signup"),
        ("click", F.col("event_type") == "click"),
        ("purchase", F.col("event_type") == "purchase"),
    ]


def test_funnel_enforces_order(spark):
    # u1 completes in order; u2 clicked BEFORE signup -> click must not count
    ev = _events(
        spark,
        [
            (1, "signup", 1, 0), (1, "click", 1, 5), (1, "purchase", 2, 0),
            (2, "click", 1, 0), (2, "signup", 1, 5),
        ],
    )
    rows = {r["user_id"]: r for r in funnel(ev, _steps()).collect()}
    assert rows[1]["purchase"] is not None
    assert rows[2]["signup"] is not None and rows[2]["click"] is None


def test_funnel_within_bound(spark):
    # u1 purchases 10 days after signup: outside the 7-day window
    ev = _events(
        spark,
        [(1, "signup", 1, 0), (1, "click", 2, 0), (1, "purchase", 11, 0)],
    )
    row = funnel(ev, _steps(), within="7 DAYS").collect()[0]
    assert row["click"] is not None and row["purchase"] is None


def test_funnel_counts_monotone(spark, sf_dir):
    from datacamp_etl_spark.queries import t

    ev = t(spark, sf_dir, "events")
    counts = {
        r["step"]: r["n_users"]
        for r in funnel_counts(ev, _steps(), within="7 DAYS").collect()
    }
    assert counts["signup"] >= counts["click"] >= counts["purchase"]
    assert counts["signup"] > 0


def test_cohort_offsets(spark):
    ev = _events(
        spark,
        [
            (1, "view", 1, 0),   # week of Jan 1 (Monday)
            (1, "view", 9, 0),   # week of Jan 8 -> offset 1
            (2, "view", 9, 0),   # cohort Jan 8, offset 0
        ],
    )
    got = {
        (r["cohort"].date().isoformat(), r["period_offset"]): r["n_active"]
        for r in cohort_retention(ev).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 1): 1,
        ("2024-01-08", 0): 1,
    }
