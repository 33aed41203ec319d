"""Connected components / dedup clustering [EXT]."""

from __future__ import annotations

import pytest

from datacamp_etl_spark.operators.graph import connected_components, dedup_clusters


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_two_components(spark):
    # 1-2-3 chained, 4-5, 6 absent (no edges)
    comp = connected_components(
        _edges(spark, [(1, 2), (2, 3), (4, 5)])
    ).collect()
    got = {r["node"]: r["component"] for r in comp}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4}


def test_chain_converges_past_one_round(spark):
    # a 6-node path: min label must propagate the full diameter
    edges = _edges(spark, [(6, 5), (5, 4), (4, 3), (3, 2), (2, 1)])
    comp = connected_components(edges).collect()
    assert {r["component"] for r in comp} == {1}


def test_edge_direction_irrelevant(spark):
    a = connected_components(_edges(spark, [(1, 9), (9, 3)])).collect()
    b = connected_components(_edges(spark, [(9, 1), (3, 9)])).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_nonconvergence_raises(spark):
    with pytest.raises(RuntimeError):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(1, 8)]),
            max_iterations=1,
        )


def test_dedup_clusters_singletons_and_keep(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame([(2, 4), (4, 6)], "id_a long, id_b long")
    out = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in
           dedup_clusters(docs, pairs).collect()}
    assert out[2] == (2, True) and out[4] == (2, False) and out[6] == (2, False)
    # singletons keep themselves
    assert out[1] == (1, True) and out[3] == (3, True) and out[5] == (5, True)
