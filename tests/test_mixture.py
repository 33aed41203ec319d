"""Mixture sampling [EXT]: determinism, rate math, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacamp_etl_spark.operators import mixture


def _docs(spark, per_source):
    rows, i = [], 0
    for src, n in per_source.items():
        for _ in range(n):
            rows.append((i, src))
            i += 1
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_mixture_sample_rates_and_default(spark):
    docs = _docs(spark, {"a": 400, "b": 400, "c": 200})
    out = mixture.mixture_sample(
        docs, {"a": mixture.MILLION, "b": mixture.MILLION // 2}
    )
    by_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert by_src.get("a") == 400            # rate 1.0 keeps all
    assert 120 <= by_src.get("b", 0) <= 280  # ~50%
    assert "c" not in by_src                 # default 0 drops unknown sources


def test_mixture_sample_rejects_bad_rate(spark):
    docs = _docs(spark, {"a": 1})
    with pytest.raises(ValueError, match="rate"):
        mixture.mixture_sample(docs, {"a": mixture.MILLION + 1})


def test_mixture_sample_append_stable(spark):
    """Growing the corpus must never flip an already-kept doc — the
    property that lets a curation run be resumed/extended."""
    small = _docs(spark, {"a": 100})
    big = _docs(spark, {"a": 300})
    w = {"a": mixture.MILLION // 3}
    kept_small = {r["doc_id"] for r in mixture.mixture_sample(small, w).collect()}
    kept_big = {r["doc_id"] for r in mixture.mixture_sample(big, w).collect()}
    assert kept_small == {d for d in kept_big if d < 100}


def test_sqrt_temperature_rates(spark):
    """rare(50)/common(450): r_rare = 1e6*7*7 div 50, r_common =
    1e6*7*21 div 450 — exact integer expectations."""
    docs = _docs(spark, {"rare": 50, "common": 450})
    out = mixture.sqrt_temperature_mix(docs)
    rates = {
        r["source"]: r["rate_millionths"]
        for r in out.select("source", "rate_millionths").distinct().collect()
    }
    assert rates == {"rare": 980_000, "common": 326_666}
    # kept sizes concentrate near n * r
    ns = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert 35 <= ns["rare"] <= 50
    assert 100 <= ns["common"] <= 195


def test_sqrt_temperature_partition_invariant(spark):
    docs = _docs(spark, {"x": 30, "y": 300})
    a = sorted(r["doc_id"] for r in mixture.sqrt_temperature_mix(docs).collect())
    b = sorted(
        r["doc_id"]
        for r in mixture.sqrt_temperature_mix(docs.repartition(17)).collect()
    )
    assert a == b


def test_temperature_mix_broadcasts_rate_table(spark):
    """The corpus side must not shuffle: the rate table broadcasts."""
    docs = _docs(spark, {"x": 30, "y": 300})
    plan = (
        mixture.sqrt_temperature_mix(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_stratified_sample_exact_k(spark):
    from datacamp_etl_spark.operators.mixture import (
        stratified_sample_exact_k,
    )

    rows = [(i, "big" if i < 90 else "tiny") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample_exact_k(df, "lang", 25).collect()
    by = {}
    for r in out:
        by.setdefault(r["lang"], set()).add(r["doc_id"])
    assert len(by["big"]) == 25          # exact k
    assert len(by["tiny"]) == 10         # stratum smaller than k: all
    # deterministic: same rows on a re-run
    again = {
        (r["lang"], r["doc_id"])
        for r in stratified_sample_exact_k(df, "lang", 25).collect()
    }
    assert again == {(l, d) for l, ds in by.items() for d in ds}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        stratified_sample_exact_k(df, "lang", 0)
