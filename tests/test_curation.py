"""Per-group caps + percentile trims (operators/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.curation import (
    cap_per_group,
    percentile_trim,
    percentile_trim_approx,
)


def _docs(spark, n, groups):
    return spark.createDataFrame(
        [(i, f"g{i % groups}", 10 + i % 37) for i in range(n)],
        "doc_id long, source string, n_chars int",
    )


def test_cap_per_group_bound_and_determinism(spark):
    df = _docs(spark, 200, 4)
    capped = cap_per_group(df, "source", "doc_id", 5)
    per_group = capped.groupBy("source").count().collect()
    assert all(r["count"] == 5 for r in per_group)

    # append-stability: growing ANOTHER group must not change the
    # survivor set of g0
    survivors_before = {
        r["doc_id"]
        for r in capped.where(F.col("source") == "g0").collect()
    }
    extra = spark.createDataFrame(
        [(1000 + i, "g9", 5) for i in range(50)],
        "doc_id long, source string, n_chars int",
    )
    capped2 = cap_per_group(df.unionByName(extra), "source", "doc_id", 5)
    survivors_after = {
        r["doc_id"]
        for r in capped2.where(F.col("source") == "g0").collect()
    }
    assert survivors_before == survivors_after


def test_percentile_trim_exact_fraction(spark):
    df = _docs(spark, 1000, 4)
    kept = percentile_trim(df, "n_chars", "doc_id", buckets=20)
    assert kept.count() == 900  # drops exactly 1/20 at each end


def test_percentile_trim_approx_brackets_exact(spark):
    df = _docs(spark, 1000, 4)
    kept = percentile_trim_approx(df, "n_chars", 0.05, 0.95, 0.001)
    n = kept.count()
    # with near-zero relative error the approx trim is within a few
    # tied values of the exact 90% band
    assert 850 <= n <= 1000
    lo, hi = df.approxQuantile("n_chars", [0.05, 0.95], 0.001)
    vals = kept.agg(F.min("n_chars"), F.max("n_chars")).collect()[0]
    assert vals[0] >= lo and vals[1] <= hi
