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


def test_star_matches_plain_on_mixed_graph(spark):
    """Equivalence on a SHALLOW graph (plain propagation is diameter-
    bound, so the shared fixture must be star/clique-shaped — depth
    is exercised by the chain test below)."""
    from datacamp_etl_spark.operators import graph as G

    rows = []
    rows += [(h, h + k) for h in (0, 100, 200) for k in range(1, 8)]   # stars
    rows += [(300 + i, 300 + j) for i in range(5) for j in range(i)]   # clique
    rows += [(107, 204), (5, 104)]                                     # bridges
    edges = spark.createDataFrame(rows, "src long, dst long")
    a = {r["node"]: r["component"]
         for r in G.connected_components(edges).collect()}
    b = {r["node"]: r["component"]
         for r in G.connected_components_star(edges).collect()}
    assert a == b
    assert b[204] == 0 and b[104] == 0  # bridges fused the stars


def test_star_keeps_self_loop_only_nodes(spark):
    """A node whose only edge is a self-loop is a singleton component
    in BOTH variants (the star variant builds its node set before
    stripping self-loops)."""
    from datacamp_etl_spark.operators import graph as G

    edges = spark.createDataFrame(
        [(1, 2), (7, 7)], "src long, dst long"
    )
    a = {r["node"]: r["component"]
         for r in G.connected_components(edges).collect()}
    b = {r["node"]: r["component"]
         for r in G.connected_components_star(edges).collect()}
    assert a == b == {1: 1, 2: 1, 7: 7}


def test_star_converges_fast_on_long_chain(spark):
    """A 150-link path has diameter 150: plain propagation cannot
    close it in 8 rounds; star contraction converges within its
    20-round default (~log2 depth)."""
    import pytest

    from datacamp_etl_spark.operators import graph as G

    chain = spark.range(150).selectExpr("id AS src", "id + 1 AS dst")
    with pytest.raises(RuntimeError, match="did not converge"):
        G.connected_components(chain, max_iterations=8)
    comp = G.connected_components_star(chain).collect()
    assert {r["component"] for r in comp} == {0}
    assert len(comp) == 151
