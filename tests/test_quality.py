"""Corpus-quality operators [EXT]: contamination + repetition."""

from __future__ import annotations

from decimal import Decimal

from datacamp_etl_spark.operators.quality import (
    contamination_check,
    repetition_profile,
)


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),  # shares 3-grams w/ bench
            (2, "one two three four five six"),  # clean
            (3, "alpha beta gamma zeta"),  # 1 contaminated 3-gram
            (4, "xy"),  # too short: no shingles
        ],
        "doc_id long, text string",
    )


def _bench(spark):
    return spark.createDataFrame(
        [(100, "ALPHA beta Gamma delta!")],  # normalizes to 2 3-grams
        "doc_id long, text string",
    )


def test_contamination_check(spark):
    out = {
        r["doc_id"]: r
        for r in contamination_check(_corpus(spark), _bench(spark)).collect()
    }
    # doc 4 has no shingles -> absent by construction
    assert set(out) == {1, 2, 3}
    # doc 1: 3 shingles, 2 contaminated ("alpha beta gamma",
    # "beta gamma delta"); "gamma delta epsilon" is not in the bench
    assert out[1]["n_shingles"] == 3
    assert out[1]["n_contaminated"] == 2
    assert out[1]["is_contaminated"] is True
    assert out[1]["contamination_ratio"] == Decimal("0.6667")
    # doc 2: clean
    assert out[2]["n_contaminated"] == 0
    assert out[2]["is_contaminated"] is False
    # doc 3: only "alpha beta gamma"
    assert out[3]["n_contaminated"] == 1


def test_contamination_min_hits(spark):
    out = {
        r["doc_id"]: r["is_contaminated"]
        for r in contamination_check(
            _corpus(spark), _bench(spark), min_hits=2
        ).collect()
    }
    assert out[1] is True  # 2 hits
    assert out[3] is False  # only 1 hit


def test_repetition_profile(spark):
    df = spark.createDataFrame(
        [
            (1, "a a a a b"),  # heavy repetition
            (2, "u v w x y z"),  # all distinct
            (3, ""),  # empty
            (4, "solo"),  # single token: no bigrams
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in repetition_profile(df).collect()}
    r1 = out[1]
    assert (r1["n_tokens"], r1["n_distinct_tokens"]) == (5, 2)
    assert r1["dup_token_ratio"] == Decimal("0.6000")
    assert r1["top_token_frac"] == Decimal("0.8000")  # 'a' x4 / 5
    # bigrams: "a a","a a","a a","a b" -> 4 total, 2 distinct
    assert r1["dup_bigram_frac"] == Decimal("0.5000")
    r2 = out[2]
    assert r2["dup_token_ratio"] == Decimal("0.0000")
    assert r2["top_token_frac"] == Decimal("0.1667")
    assert r2["dup_bigram_frac"] == Decimal("0.0000")
    r3 = out[3]
    assert r3["n_tokens"] == 0
    assert r3["dup_token_ratio"] is None
    assert r3["dup_bigram_frac"] is None
    r4 = out[4]
    assert r4["n_tokens"] == 1
    assert r4["top_token_frac"] == Decimal("1.0000")
    assert r4["dup_bigram_frac"] is None  # no bigrams


def test_contamination_plan_broadcasts_benchmark_only(spark):
    """The benchmark side must be the broadcast build side; the corpus
    must never be broadcast (it scales)."""
    plan = contamination_check(
        _corpus(spark), _bench(spark)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_contamination_apply_removes_flagged_keeps_short(spark):
    from datacamp_etl_spark.operators.quality import contamination_apply

    out = contamination_apply(_corpus(spark), _bench(spark))
    kept = sorted(r["doc_id"] for r in out.collect())
    # 1 and 3 share benchmark 3-grams -> dropped; 2 is clean; 4 is too
    # short to carry a 3-gram -> kept by construction
    assert kept == [2, 4]
    # full corpus schema passes through untouched
    assert out.columns == _corpus(spark).columns
