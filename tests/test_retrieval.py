"""Retrieval operators [EXT]: TF-IDF, BM25."""

from __future__ import annotations

import math

from datacamp_etl_spark.operators.retrieval import bm25_search, tfidf_topk_terms


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark spark spark filter"),
            (2, "filter window join"),
            (3, "window window group sort"),
            (4, "join join join join"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_topk(spark):
    out = tfidf_topk_terms(_docs(spark), top_k=1).collect()
    best = {r["doc_id"]: r for r in out}
    assert len(out) == 4  # one term per doc at k=1
    # doc 1: spark tf=3 df=1 -> 3*ln(4) dominates
    assert best[1]["term"] == "spark"
    assert best[1]["tf"] == 3 and best[1]["df"] == 1
    assert abs(best[1]["tfidf"] - round(3 * math.log(4), 4)) < 1e-9
    assert best[4]["term"] == "join"
    assert best[1]["rank"] == 1


def test_tfidf_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b a"), (2, "c d")], "doc_id long, text string"
    )
    out = [
        r["term"]
        for r in tfidf_topk_terms(df, top_k=1).orderBy("doc_id").collect()
    ]
    # equal tf/df everywhere -> alphabetical wins
    assert out == ["a", "c"]


def test_bm25_ranks_term_matches(spark):
    out = bm25_search(_docs(spark), ["spark", "filter"], top_k=4).collect()
    ids = [r["doc_id"] for r in out]
    # docs 1 and 2 hit; 3 and 4 don't appear at all
    assert set(ids) == {1, 2}
    hit = {r["doc_id"]: r["n_hit_terms"] for r in out}
    assert hit[1] == 2 and hit[2] == 1
    assert out[0]["doc_id"] == 1  # two query terms + high tf wins
    assert all(r["score"] > 0 for r in out)


def test_bm25_plan_no_cartesian_on_corpus(spark):
    plan = (
        bm25_search(_docs(spark), ["spark"], top_k=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the only cross joins are one-row scalar broadcasts
    assert "CartesianProduct" not in plan
    assert "TakeOrdered" in plan


def test_hybrid_rrf_fuses_both_pools(spark, sf_dir):
    from datacamp_etl_spark.operators.retrieval import hybrid_search_rrf
    from datacamp_etl_spark.queries import _BM25_TERMS, _query_vector, t

    out = hybrid_search_rrf(
        t(spark, sf_dir, "documents"),
        t(spark, sf_dir, "embeddings"),
        list(_BM25_TERMS),
        _query_vector(spark, sf_dir, 0),
        top_k=10,
        pool=30,
    ).collect()
    assert len(out) == 10
    # scores are in [0, 2/(60+1)] and non-increasing
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(0 < s <= 2 / 61 + 1e-9 for s in scores)
    # a doc ranked in BOTH pools must outscore one ranked in a single
    # pool at similar rank
    both = [r for r in out if r["lex_rank"] and r["vec_rank"]]
    single = [r for r in out if not (r["lex_rank"] and r["vec_rank"])]
    if both and single:
        assert max(r["rrf_score"] for r in both) >= max(
            r["rrf_score"] for r in single
        )


# ---------------------------------------------------------------------
# retrieval.mmr_rerank
# ---------------------------------------------------------------------


def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_mmr_prefers_diversity_over_redundancy(spark):
    from datacamp_etl_spark.operators.retrieval import mmr_rerank

    # q = x-axis; ids 1,2 nearly identical (sim ~ 0.999), id 3
    # slightly less relevant but on the OTHER side of q (sim to 1 ~
    # 0.72). Pure relevance ranks (1, 2, 3); at lambda=0.7 the
    # redundancy penalty flips rank 2 to the diverse candidate:
    #   score(2) ~ 7*0.94 - 3*0.999 = 3.58
    #   score(3) ~ 7*0.90 - 3*0.719 = 4.14
    df = _vec_df(
        spark,
        [
            (1, [0.95, 0.312]),
            (2, [0.94, 0.341]),
            (3, [0.90, -0.436]),
        ],
    )
    out = mmr_rerank(df, [1.0, 0.0], pool_k=3, k=3)
    order = [r["vec_id"] for r in out.orderBy("rank").collect()]
    assert order == [1, 3, 2]


def test_mmr_lambda_ten_is_pure_relevance(spark):
    from datacamp_etl_spark.operators.retrieval import mmr_rerank
    from datacamp_etl_spark.operators.similarity import brute_force_topk

    df = _vec_df(
        spark,
        [(i, [1.0, i / 10.0, (i % 3) / 5.0]) for i in range(1, 9)],
    )
    q = [1.0, 0.2, 0.1]
    mmr = mmr_rerank(df, q, pool_k=8, k=5, lambda_tenths=10)
    pure = brute_force_topk(df, q, k=5)
    assert [r["vec_id"] for r in mmr.orderBy("rank").collect()] == [
        r["vec_id"] for r in pure.collect()
    ]


def test_mmr_tie_breaks_to_lowest_id(spark):
    from datacamp_etl_spark.operators.retrieval import mmr_rerank

    # identical vectors: every step ties on score -> ids ascend
    df = _vec_df(spark, [(i, [1.0, 1.0]) for i in (5, 2, 9)])
    out = mmr_rerank(df, [1.0, 1.0], pool_k=3, k=3)
    assert [r["vec_id"] for r in out.orderBy("rank").collect()] == [2, 5, 9]


def test_mmr_rejects_bad_args(spark):
    import pytest as _pytest

    from datacamp_etl_spark.operators.retrieval import mmr_rerank

    df = _vec_df(spark, [(1, [1.0])])
    with _pytest.raises(ValueError):
        mmr_rerank(df, [1.0], pool_k=5, k=6)
    with _pytest.raises(ValueError):
        mmr_rerank(df, [1.0], lambda_tenths=11)
