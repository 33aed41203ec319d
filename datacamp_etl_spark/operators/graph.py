"""Connected components [EXT] — dedup clustering at scale.

Near-dup pair generation (MinHash-LSH / SimHash / Jaccard — see
``operators/dedup.py``) yields EDGES; deduplication needs CLUSTERS
(every document mapped to one canonical representative). That grouping
is connected components over the pair graph.

Spark-first design: iterative min-label propagation over DataFrames —
each round is one shuffle join (labels ⋈ edges) + one groupBy(min).
Rounds needed = graph diameter, and near-dup components are shallow
(stars around a canonical doc), so 3-5 rounds typically converge.
For adversarial long-chain graphs the alternating large-star/
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC'14) halves diameter per round and slots
into the same loop; plain propagation is the right default for dedup
workloads.

No driver-side materialization: the driver only sees the per-round
changed-row COUNT (the convergence test). The reference has no graph
operators (its only joins are key equijoins, lib/etl/loading.rb:232-250);
this is a north-star [EXT] addition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["connected_components", "dedup_clusters"]


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 25,
) -> DataFrame:
    """Label every node of the undirected ``edges`` graph with the
    smallest node id reachable from it (= its component id).

    Returns ``(node, component)`` for every node appearing in at least
    one edge. Raises if ``max_iterations`` rounds don't converge (a
    diameter that deep means the input isn't a dedup-pair graph; use
    large-star/small-star instead).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.persist()

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )

    for _ in range(max_iterations):
        # min label among each node's neighbors, one shuffle round
        nbr_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        proposed = (
            labels.join(nbr_min, labels.node == nbr_min.a, "left")
            .select(
                "node",
                "component",
                F.least(
                    F.col("component"),
                    F.coalesce("nbr_component", F.col("component")),
                ).alias("new_component"),
            )
            .persist()
        )
        changed = proposed.where(
            F.col("new_component") < F.col("component")
        ).count()
        new_labels = proposed.select(
            "node", F.col("new_component").alias("component")
        ).persist()
        labels.unpersist()
        proposed.unpersist()
        labels = new_labels
        if changed == 0:
            sym.unpersist()
            return labels
    sym.unpersist()
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds"
    )


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
) -> DataFrame:
    """Full dedup assignment: every document labeled with its cluster's
    canonical id (smallest member id); documents in no near-dup pair
    are their own singleton cluster.

    ``keep = (doc_id == cluster_id)`` selects one survivor per cluster.
    """
    comp = connected_components(pairs, src=pair_a, dst=pair_b)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp, F.col("doc_id") == comp.node, "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
        )
        .withColumn("keep", F.col("doc_id") == F.col("cluster_id"))
    )
