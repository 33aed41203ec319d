"""Round-7 operators: Naive Bayes classifier, IVF-PQ ANN, keep-best
dedup apply, source KL divergence, cluster purity, BPE round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_nb_classify_separable_labels(spark):
    from datacamp_etl_spark.operators.classify import nb_classify

    rows = [
        (0, "apple banana apple fruit", "fruit"),
        (1, "banana apple banana", "fruit"),
        (2, "bolt wrench hammer tool", "tool"),
        (3, "hammer bolt wrench bolt", "tool"),
        (4, "apple fruit banana apple", "fruit"),
        (5, "wrench tool hammer", "tool"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nb_classify(docs).collect()}
    assert len(out) == 6
    for i in (0, 1, 4):
        assert out[i]["predicted"] == "fruit", out[i]
    for i in (2, 3, 5):
        assert out[i]["predicted"] == "tool", out[i]
    assert out[0]["n_tokens"] == 4


def test_nb_classify_empty_doc_scores_prior(spark):
    from datacamp_etl_spark.operators.classify import nb_classify

    rows = [
        (0, "x x x", "a"),
        (1, "y", "b"),
        (2, "", "a"),  # empty: prior-only, 'a' has the larger prior? equal
        (3, "x y x", "a"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in nb_classify(docs).collect()}
    assert out[2]["n_tokens"] == 0
    # 3 of 4 docs are 'a' -> prior argmax for the empty doc is 'a'
    assert out[2]["predicted"] == "a"


def test_nb_cross_corpus_train_then_score(spark):
    from datacamp_etl_spark.operators.classify import nb_classify, nb_train

    train = spark.createDataFrame(
        [(0, "der hund und katze", "de"), (1, "the dog and cat", "en")],
        "doc_id long, text string, lang string",
    )
    test = spark.createDataFrame(
        [(10, "der katze", "?"), (11, "the cat", "?")],
        "doc_id long, text string, lang string",
    )
    model = nb_train(train)
    out = {r["doc_id"]: r for r in nb_classify(test, model).collect()}
    assert out[10]["predicted"] == "de"
    assert out[11]["predicted"] == "en"


def test_dedup_keep_best_keeps_highest_quality(spark):
    from datacamp_etl_spark.operators.graph import dedup_keep_best

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 5)],
        "doc_id long, n_chars long",
    )
    # cluster {1,2,3}: 2 and 3 tie on quality -> keep smaller id 2
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in dedup_keep_best(docs, pairs).collect()}
    assert set(out) == {2, 4}
    assert out[2]["cluster_size"] == 3
    assert out[4]["cluster_size"] == 1  # singleton survives
    assert out[4]["cluster_id"] == 4


def test_ivfpq_topk_matches_pq_ranking_on_probed_cells(spark):
    from datacamp_etl_spark.operators.pq import ivfpq_topk

    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[0][1]
    out = ivfpq_topk(
        df, q, topk=5, num_cells=8, num_probes=8, m=2, k=4
    ).collect()
    assert len(out) == 5
    dists = [r["adc_dist"] for r in out]
    assert dists == sorted(dists)
    # With probes == cells nothing is pruned, so full-probe IVF-PQ
    # must equal plain PQ (same codebooks, same ADC) over the whole
    # corpus, row for row.
    from datacamp_etl_spark.operators.pq import pq_encode, pq_topk, pq_train

    books = pq_train(df, m=2, k=4, n_iter=0)
    codes = pq_encode(df, books)
    plain = pq_topk(codes, books, q, topk=5).collect()
    assert [(r["vec_id"], r["adc_dist"]) for r in out] == [
        (r["vec_id"], r["adc_dist"]) for r in plain
    ]


def test_ivfpq_prunes_to_probed_cells(spark):
    from datacamp_etl_spark.operators.pq import ivfpq_topk

    import random

    rng = random.Random(11)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = rows[3][1]
    full = ivfpq_topk(df, q, topk=64, num_cells=8, num_probes=8, m=2, k=4)
    pruned = ivfpq_topk(df, q, topk=64, num_cells=8, num_probes=2, m=2, k=4)
    n_full, n_pruned = full.count(), pruned.count()
    assert n_full == 64
    assert 0 < n_pruned < n_full  # the probe filter actually pruned


def test_bpe_marker_roundtrip(spark):
    from datacamp_etl_spark.operators.bpe import (
        bpe_decode_expr,
        bpe_encode,
        bpe_train,
    )
    from datacamp_etl_spark.operators.text import normalize_text

    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "Hello, World!  Multiple   spaces & punct..."),
        (2, ""),
        (3, "aaaa aaaa aaaa bbbb"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(docs, num_merges=16)
    enc = bpe_encode(docs, merges, word_end_marker="</w>")
    got = {
        r["doc_id"]: r["dec"]
        for r in enc.select(
            "doc_id", bpe_decode_expr(F.col("tokens_str")).alias("dec")
        ).collect()
    }
    want = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", normalize_text(F.col("text")).alias("n")
        ).collect()
    }
    assert got == want


def test_bpe_marker_does_not_change_counts(spark):
    from datacamp_etl_spark.operators.bpe import FIXTURE_MERGES_V1, bpe_encode

    docs = spark.createDataFrame(
        [(0, "batch row batch row scan")], "doc_id long, text string"
    )
    plain = bpe_encode(docs, FIXTURE_MERGES_V1).collect()[0]
    marked = bpe_encode(
        docs, FIXTURE_MERGES_V1, word_end_marker="</w>"
    ).collect()[0]
    assert plain["n_tokens"] == marked["n_tokens"]
    assert plain["n_words"] == marked["n_words"]
    assert marked["tokens_str"].count("</w>") == plain["n_words"]


def test_source_kl_divergence_zero_for_identical_sources(spark):
    from datacamp_etl_spark.operators.text import source_kl_divergence

    rows = []
    for s in ("a", "b"):
        for i in range(5):
            rows.append((f"{s}{i}", s, "alpha beta gamma"))
    docs = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = source_kl_divergence(docs).collect()
    assert len(out) == 2
    for r in out:
        assert r["kl"] == 0.0
        assert r["n_tokens"] == 15
        assert r["n_distinct_tokens"] == 3


def test_source_kl_divergence_positive_for_skewed_source(spark):
    from datacamp_etl_spark.operators.text import source_kl_divergence

    rows = [(0, "a", "common words here"), (1, "a", "common words here"),
            (2, "b", "utterly different vocabulary entirely")]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in source_kl_divergence(docs).collect()}
    assert out["b"]["kl"] > 0
    assert out["a"]["kl"] > 0  # both diverge from the pooled corpus


def test_kmeans_cluster_purity_query_bounds(spark, sf_dir):
    from datacamp_etl_spark.queries import QUERIES

    rows = QUERIES["kmeans_cluster_purity"](spark, sf_dir).collect()
    assert rows
    total = sum(r["size"] for r in rows)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert total == emb.count()
    for r in rows:
        assert 0.0 < r["purity"] <= 1.0
