"""Parallelism floor + single-evaluation barrier [EXT]."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.spread import ensure_parallelism, evaluate_once


def test_ensure_parallelism_spreads_small_input(spark):
    df = spark.range(100).coalesce(1)
    out = ensure_parallelism(df, 8)
    assert out.rdd.getNumPartitions() == 8
    assert out.count() == 100


def test_ensure_parallelism_noop_when_wide_enough(spark):
    df = spark.range(100).repartition(16)
    out = ensure_parallelism(df, 8)
    # unchanged plan: no extra exchange on top
    assert out is df


def test_evaluate_once_values_and_barrier(spark):
    df = spark.createDataFrame([("a b c",), ("",)], "text string")
    out = evaluate_once(
        df, {"toks": F.split("text", " "), "n": F.length("text")}
    )
    rows = sorted(
        (r["text"], r["toks"], r["n"]) for r in out.collect()
    )
    assert rows == [("", [""], 0), ("a b c", ["a", "b", "c"], 5)]
    # the barrier is a Generate node in the plan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Generate" in plan, plan


def test_evaluate_once_downstream_refs_extract_not_recompute(spark):
    """Downstream projections must reference the generated struct
    field, not inline the original expression (the optimized plan
    contains the expression exactly once)."""
    df = spark.createDataFrame([("x y",)], "text string")
    out = evaluate_once(df, {"toks": F.split("text", " ")})
    derived = out.select(
        F.size("toks").alias("a"),
        F.array_distinct(F.col("toks")).alias("b"),
        F.reverse(F.col("toks")).alias("c"),
    )
    plan = derived._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, plan
