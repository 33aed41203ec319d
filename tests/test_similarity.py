"""Similarity-search operators [EXT]."""

from __future__ import annotations

import math
import os

import pytest

from datacamp_etl_spark.operators import similarity as S


def _vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
        (5, [0.5, 0.5, 0.5, 0.5]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_brute_force_topk_ordering(spark):
    out = S.brute_force_topk(_vectors(spark), [1.0, 0.0, 0.0, 0.0], k=3)
    rows = out.collect()
    assert [r["vec_id"] for r in rows] == [1, 2, 5]
    assert float(rows[0]["cosine"]) == 1.0
    expected2 = 0.9 / math.sqrt(0.81 + 0.01)
    assert abs(float(rows[1]["cosine"]) - expected2) < 1e-5


def test_lsh_topk_contains_query_bucket_hits(spark):
    query = [1.0, 0.0, 0.0, 0.0]
    out = S.lsh_topk(_vectors(spark), query, k=5, num_planes=2)
    ids = [r["vec_id"] for r in out.collect()]
    assert 1 in ids            # identical vector always in the query's bucket
    assert 4 not in ids or len(ids) == 5  # opposite vector rarely shares bucket


def test_ivf_topk_matches_bruteforce_top1(spark):
    df = _vectors(spark)
    query = [0.9, 0.1, 0.0, 0.0]
    exact = S.brute_force_topk(df, query, k=1).collect()[0]
    approx = S.ivf_topk(df, query, k=1, num_cells=3, num_probes=3).collect()[0]
    assert approx["vec_id"] == exact["vec_id"]


def test_cosine_near_dup_pairs_exact(spark):
    pairs = {
        (r["id_a"], r["id_b"]): float(r["cosine"])
        for r in S.cosine_near_dup_pairs(
            _vectors(spark), threshold=0.9, exact=True
        ).collect()
    }
    assert (1, 2) in pairs
    assert all(v >= 0.9 for v in pairs.values())
    assert (1, 4) not in pairs


def test_cosine_near_dup_exact_size_guard(spark):
    # exact=True must refuse O(n²) work above max_exact_rows; an
    # explicit override forces it through.
    df = _vectors(spark)
    with pytest.raises(ValueError, match="all-pairs plan is O"):
        S.cosine_near_dup_pairs(df, exact=True, max_exact_rows=3)
    out = S.cosine_near_dup_pairs(
        df, threshold=0.9, exact=True, max_exact_rows=5
    )
    assert (1, 2) in {(r["id_a"], r["id_b"]) for r in out.collect()}


def test_knn_join_topk(spark):
    df = _vectors(spark)
    out = S.knn_join_topk(df.limit(2), df, k=2)
    rows = [r for r in out.collect() if r["query_id"] == 1]
    assert [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])] == [2, 5]


def test_embeddings_table_topk(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    query = emb.where("vec_id = 0").collect()[0]["embedding"]
    out = S.brute_force_topk(emb, query, k=5).collect()
    assert out[0]["vec_id"] == 0 and abs(float(out[0]["cosine"]) - 1.0) < 1e-6
    assert len(out) == 5
    # LSH variant returns a subset ordered the same way
    lsh = S.lsh_topk(emb, query, k=5, num_planes=4).collect()
    assert lsh[0]["vec_id"] == 0


def test_kmeans_train_deterministic_and_sane(spark):
    import random

    from datacamp_etl_spark.operators.similarity import kmeans_train

    rng = random.Random(7)
    # two well-separated blobs in 4-d
    rows = [
        (i, [rng.gauss(5.0 if i % 2 else -5.0, 0.3) for _ in range(4)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out1 = {r["vec_id"]: r["cluster"] for r in kmeans_train(df, k=2, n_iter=3).collect()}
    out2 = {r["vec_id"]: r["cluster"] for r in kmeans_train(df, k=2, n_iter=3).collect()}
    assert out1 == out2  # deterministic across runs
    # the two blobs must land in different clusters, pure within blob
    even = {out1[i] for i in range(0, 40, 2)}
    odd = {out1[i] for i in range(1, 40, 2)}
    assert len(even) == 1 and len(odd) == 1 and even != odd
    dists = [r["dist"] for r in kmeans_train(df, k=2, n_iter=3).collect()]
    assert all(d is not None and d >= 0 for d in dists)


def test_semantic_dedup_within_cluster_keep_contract(spark):
    # 1 and 2 are near-identical (cos ~ 0.994); 4 is the antipode of 1.
    out = {
        r["vec_id"]: (r["cluster"], r["keep"])
        for r in S.semantic_dedup(
            _vectors(spark), k=2, n_iter=1, threshold=0.9
        ).collect()
    }
    assert len(out) == 5
    # every cluster keeps at least one member
    clusters = {c for c, _ in out.values()}
    for c in clusters:
        assert any(k for cc, k in out.values() if cc == c)
    # if 1 and 2 share a cluster, the larger id is the dropped one
    if out[1][0] == out[2][0]:
        assert out[1][1] and not out[2][1]
    # dissimilar vectors never drop each other: 4 can only be dropped
    # by a same-cluster vector with cosine >= 0.9, and no such vector
    # exists in the fixture
    assert out[4][1]


def test_semantic_dedup_zero_norm_vectors_never_drop(spark):
    # degenerate (all-zero) embeddings have NULL cosine under the
    # den != 0 guard: they must neither be dropped nor drop anyone,
    # whatever cluster they land in — pins the contract the oracle
    # mirrors with its a.ss * b.ss <> 0 predicate
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 0.0, 0.0, 0.0]),  # zero-norm
        (4, [0.0, 0.0, 0.0, 0.0]),  # zero-norm twin
        (5, [0.5, 0.5, 0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r["keep"]
        for r in S.semantic_dedup(df, k=2, n_iter=1, threshold=0.1).collect()
    }
    # both zero vectors survive even though their mutual cosine is
    # undefined (a NaN-above-threshold engine would drop vec 4)
    assert out[3] and out[4]
    # non-degenerate near-dups still dedup as usual
    if 2 in out:
        assert not out[2] or out[1]


def test_semantic_dedup_derived_k_grows_with_corpus(spark):
    # k=None derives max(k_min, ceil(n / target_cluster_rows)): with
    # 40 rows and target 10 the corpus must land in >= 4 clusters
    rows = [(i, [float(i % 7), float(i % 5), 1.0, 0.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.semantic_dedup(
        df, n_iter=1, threshold=0.99, k_min=4, target_cluster_rows=10
    )
    n_clusters = out.select("cluster").distinct().count()
    assert n_clusters >= 2  # k-means may merge, but k was 4, not k_min=8


def test_vector_kernels_soft_null_on_malformed_embeddings(spark):
    """NULL and ragged embedding cells must NOT crash the Arrow
    kernels (ADVICE r5): they follow the zero-norm soft-NULL contract
    — NULL cluster/dist in the assign step, keep=True and
    never-drops-others in the dedup verdicts."""
    from datacamp_etl_spark.operators.vector_kernel import (
        assign_nearest_centroid,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.99, 0.01, 0.0, 0.0]),   # near-dup of 1
        (3, None),                      # NULL cell
        (4, [1.0, 0.0]),                # ragged (wrong dim)
        (5, [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    assigned = assign_nearest_centroid(
        df, [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    )
    got = {r["vec_id"]: (r["cluster"], r["__dist"]) for r in assigned.collect()}
    assert got[1][0] == 0 and got[5][0] == 1
    assert got[3] == (None, None) and got[4] == (None, None)

    out = {
        r["vec_id"]: r["keep"]
        for r in S.semantic_dedup(df, k=2, n_iter=1, threshold=0.9).collect()
    }
    # malformed rows always survive; the well-formed near-dup pair
    # still dedups to its lowest id
    assert out[3] and out[4]
    assert out[1] and not out[2]
