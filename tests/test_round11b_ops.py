"""Round-11 widening operators: Theil–Sen robust slope and k-core
peeling, the survival/hazard life table, the one-pass correlation
matrix, PRF query expansion, the effective-corpus-size report and
hard-negative mining.

Every assertion is against a hand-computed ground truth on a fixture
small enough to verify on paper."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------ theil-sen

def _daily_events(spark, day_values):
    rows = [
        (1, f"1970-01-{d + 1:02d} 01:00:00", "a", float(v))
        for d, v in day_values
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    )
    return df.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "value",
    )


def test_theil_sen_ignores_outlier_day(spark):
    from datacamp_etl_spark.operators.timeseries import (
        theil_sen_slope,
        trend_slope,
    )

    # days 0..4 with totals 0,1,2,3,100: 6 of 10 pairwise slopes are
    # exactly 1.0 -> median 1.0; OLS is dragged far above
    ev = _daily_events(spark, [(0, 0), (1, 1), (2, 2), (3, 3), (4, 100)])
    ts = theil_sen_slope(ev, "ts", "value", "event_type").collect()[0]
    assert (ts["n_days"], ts["n_pairs"]) == (5, 10)
    assert ts["slope"] == pytest.approx(1.0)
    ols = trend_slope(ev, "ts", "value", "event_type").collect()[0]
    assert ols["slope"] > 10  # the outlier owns the OLS line


def test_theil_sen_even_pair_count_averages_middles(spark):
    from datacamp_etl_spark.operators.timeseries import theil_sen_slope

    # 4 days, totals 0,2,4,60 -> 6 pair slopes: 2,2,2,20,29,56
    # -> median = (2 + 20) / 2 = 11
    ev = _daily_events(spark, [(0, 0), (1, 2), (2, 4), (3, 60)])
    r = theil_sen_slope(ev, "ts", "value", "event_type").collect()[0]
    assert r["n_pairs"] == 6
    assert r["slope"] == pytest.approx(11.0)


def test_theil_sen_single_day_is_null(spark):
    from datacamp_etl_spark.operators.timeseries import theil_sen_slope

    ev = _daily_events(spark, [(0, 5)])
    r = theil_sen_slope(ev, "ts", "value", "event_type").collect()[0]
    assert (r["n_days"], r["n_pairs"], r["slope"]) == (1, 0, None)


# ------------------------------------------------------ survival hazard

def test_survival_hazard_hand_case(spark):
    from datacamp_etl_spark.operators.funnel import survival_hazard

    rows = [
        (1, "1970-01-01 01:00:00"),  # u1: days 0..10 -> censored
        (1, "1970-01-11 01:00:00"),
        (2, "1970-01-01 01:00:00"),  # u2: days 0..2, gone 8d -> churn
        (2, "1970-01-03 01:00:00"),
        (3, "1970-01-06 01:00:00"),  # u3: day 5 only, 5d < 7 -> censored
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts")
    )
    got = {r["t_days"]: r for r in survival_hazard(df).collect()}
    assert sorted(got) == [0, 2, 10]
    assert got[0]["n_at_risk"] == 3 and got[0]["n_censored"] == 1
    assert got[0]["hazard_ppm"] == 0
    assert got[2]["n_at_risk"] == 2 and got[2]["n_churned"] == 1
    assert got[2]["hazard_ppm"] == 500_000
    assert got[10]["n_at_risk"] == 1 and got[10]["n_censored"] == 1


def test_survival_hazard_rejects_negative_censor(spark):
    from datacamp_etl_spark.operators.funnel import survival_hazard

    df = spark.createDataFrame([(1, "1970-01-01")], "user_id long, ts string")
    with pytest.raises(ValueError, match="censor_days"):
        survival_hazard(df, censor_days=-1)


# -------------------------------------------------- correlation matrix

def test_numeric_correlations_hand_case(spark):
    from datacamp_etl_spark.operators.profile import numeric_correlations

    rows = [(float(i), float(2 * i), float(-3 * i), 7.0) for i in range(1, 6)]
    df = spark.createDataFrame(rows, "x double, y double, z double, c double")
    got = {
        (r["col_a"], r["col_b"]): r
        for r in numeric_correlations(df, ["x", "y", "z", "c"]).collect()
    }
    assert len(got) == 6
    assert got[("x", "y")]["r"] == pytest.approx(1.0)
    assert got[("x", "z")]["r"] == pytest.approx(-1.0)
    assert got[("x", "c")]["r"] is None  # zero variance side
    assert all(r["n_rows"] == 5 for r in got.values())


def test_numeric_correlations_pairwise_complete_nulls(spark):
    from datacamp_etl_spark.operators.profile import numeric_correlations

    rows = [(1.0, 2.0), (2.0, 4.0), (3.0, None), (4.0, 8.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    r = numeric_correlations(df, ["x", "y"]).collect()[0]
    assert r["n_rows"] == 3 and r["r"] == pytest.approx(1.0)


def test_numeric_correlations_needs_two_cols(spark):
    from datacamp_etl_spark.operators.profile import numeric_correlations

    df = spark.createDataFrame([(1.0,)], "x double")
    with pytest.raises(ValueError, match="at least 2"):
        numeric_correlations(df, ["x"])


# ----------------------------------------------------------- k-core

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_kcore_triangle_with_pendant(spark):
    from datacamp_etl_spark.operators.graph import kcore_peel

    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4)])
    got = {
        r["node"]: r["core_deg"]
        for r in kcore_peel(e, 2, iterations=2).collect()
    }
    assert got == {1: 2, 2: 2, 3: 2}  # pendant 4 peeled, triangle holds


def test_kcore_extra_rounds_are_noops_after_convergence(spark):
    from datacamp_etl_spark.operators.graph import kcore_peel

    e = _edges(spark, [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)])
    a = sorted(
        (r["node"], r["core_deg"])
        for r in kcore_peel(e, 2, iterations=2).collect()
    )
    b = sorted(
        (r["node"], r["core_deg"])
        for r in kcore_peel(e, 2, iterations=5).collect()
    )
    assert a == b == [(1, 2), (2, 2), (3, 2)]


def test_kcore_k3_empties_a_triangle(spark):
    from datacamp_etl_spark.operators.graph import kcore_peel

    e = _edges(spark, [(1, 2), (2, 3), (1, 3)])
    assert kcore_peel(e, 3, iterations=1).count() == 0


def test_kcore_rejects_bad_params(spark):
    from datacamp_etl_spark.operators.graph import kcore_peel

    e = _edges(spark, [(1, 2)])
    with pytest.raises(ValueError):
        kcore_peel(e, 0)
    with pytest.raises(ValueError):
        kcore_peel(e, 2, iterations=0)


# ------------------------------------------------------ PRF expansion

def test_prf_expansion_hand_case(spark):
    import math

    from datacamp_etl_spark.operators.retrieval import prf_expansion_terms

    docs = spark.createDataFrame(
        [
            (1, "apple spark banana banana"),
            (2, "spark banana cherry"),
            (3, "durian durian durian"),
        ],
        "doc_id long, text string",
    )
    got = prf_expansion_terms(
        docs, ["spark"], fb_k=2, top_n=2
    ).collect()
    assert [r["term"] for r in got] == ["banana", "apple"]
    b = got[0]
    assert (b["fb_tf"], b["fb_docs"], b["df"]) == (3, 2, 2)
    assert b["score"] == pytest.approx(round(3 * math.log(3 / 2), 4))
    assert got[1]["score"] == pytest.approx(round(math.log(3.0), 4))
    assert [r["rank"] for r in got] == [1, 2]


def test_prf_excludes_query_terms_and_stopwords(spark):
    from datacamp_etl_spark.operators.retrieval import prf_expansion_terms

    docs = spark.createDataFrame(
        [(1, "the spark and the apple"), (2, "spark of the apple")],
        "doc_id long, text string",
    )
    terms = {
        r["term"]
        for r in prf_expansion_terms(docs, ["spark"], fb_k=2, top_n=8).collect()
    }
    assert "spark" not in terms and "the" not in terms and "and" not in terms
    assert "apple" in terms


# ----------------------------------------------- effective corpus size

def test_effective_corpus_size_consistency(spark, sf_dir):
    from datacamp_etl_spark.queries import QUERIES

    r = QUERIES["effective_corpus_size"](spark, sf_dir).collect()[0]
    assert 0 < r["n_near_unique"] <= r["n_exact_unique"] <= r["n_docs"]
    assert 0 < r["near_tokens"] <= r["exact_tokens"] <= r["n_tokens"]
    assert r["exact_dup_ppm"] == (
        1_000_000 * (r["n_docs"] - r["n_exact_unique"]) // r["n_docs"]
    )
    assert r["near_dup_ppm"] == (
        1_000_000 * (r["n_docs"] - r["n_near_unique"]) // r["n_docs"]
    )
    assert r["token_retention_ppm"] == (
        1_000_000 * r["near_tokens"] // r["n_tokens"]
    )


# ------------------------------------------------------ hard negatives

def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_hard_negatives_filters_before_rank(spark):
    from datacamp_etl_spark.operators.similarity import hard_negatives

    # anchor 1 (label 0): most-similar rows 2,3 share its label and
    # must NOT appear; the top negatives are the cross-label 4 then 5
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.99, 0.01], 0),
        (3, [0.98, 0.02], 0),
        (4, [0.9, 0.1], 1),
        (5, [0.0, 1.0], 1),
    ]
    emb = _emb(spark, rows)
    got = hard_negatives(
        emb.where("vec_id = 1"), emb, k=2
    ).collect()
    assert [r["neighbor_id"] for r in got] == [4, 5]
    assert all(r["neighbor_label"] == 1 for r in got)
    assert [r["rank"] for r in got] == [1, 2]


def test_hard_negatives_excludes_self_and_caps_k(spark):
    from datacamp_etl_spark.operators.similarity import hard_negatives

    rows = [(1, [1.0, 0.0], 0), (2, [1.0, 0.0], 1), (3, [0.5, 0.5], 1)]
    emb = _emb(spark, rows)
    got = hard_negatives(emb.where("vec_id = 1"), emb, k=1).collect()
    assert len(got) == 1 and got[0]["neighbor_id"] == 2


def test_hard_negatives_anchor_cap_raises(spark):
    from datacamp_etl_spark.operators.similarity import hard_negatives

    emb = _emb(spark, [(i, [1.0, 0.0], i % 2) for i in range(10)])
    with pytest.raises(ValueError, match="inlines the anchor set"):
        hard_negatives(emb, emb, max_inline_anchors=5)


# ------------------------------------------------------ basket triples

def _baskets(spark, rows):
    return spark.createDataFrame(rows, "b long, i string")


def test_basket_triple_hand_case(spark):
    from datacamp_etl_spark.operators.basket import basket_triple_lift

    # baskets: {a,b,c} x2, {a,b,d}, {d} -> triple (a,b,c) n=2;
    # (a,b,d) n=1 < min_count
    rows = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"), (2, "c"),
        (3, "a"), (3, "b"), (3, "d"),
        (4, "d"),
    ]
    got = basket_triple_lift(
        _baskets(spark, rows), "b", "i", min_count=2
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["item_a"], r["item_b"], r["item_c"], r["n_triple"]) == (
        "a", "b", "c", 2,
    )
    # N=4, n_a=3, n_b=3, n_c=2: lift = 16*2/(3*3*2)
    assert r["support"] == pytest.approx(0.5)
    assert r["lift"] == pytest.approx(round(16 * 2 / 18, 6))


def test_basket_triple_l1_prune_preserves_results(spark):
    from datacamp_etl_spark.operators.basket import basket_triple_lift

    # an item below min_count can never be in a frequent triple: the
    # L1 prune must not change the surviving set
    rows = [
        (1, "a"), (1, "b"), (1, "c"), (1, "x"),
        (2, "a"), (2, "b"), (2, "c"),
    ]
    got = basket_triple_lift(
        _baskets(spark, rows), "b", "i", min_count=2
    ).collect()
    assert [(r["item_a"], r["item_b"], r["item_c"]) for r in got] == [
        ("a", "b", "c")
    ]


def test_basket_triple_mega_basket_cap(spark):
    from datacamp_etl_spark.operators.basket import basket_triple_lift

    rows = [(1, f"i{j}") for j in range(6)] + [
        (2, "i0"), (2, "i1"), (2, "i2"),
        (3, "i0"), (3, "i1"), (3, "i2"),
    ]
    # cap 5 drops basket 1 (6 items); triples from baskets 2,3 remain
    got = basket_triple_lift(
        _baskets(spark, rows), "b", "i", min_count=2, max_basket_size=5
    ).collect()
    assert len(got) == 1 and got[0]["n_triple"] == 2
