"""Vector similarity search over embedding columns [EXT].

Operators over an ``array<float>`` embedding column:

- **brute_force_topk**: exact cosine top-k of every row vs a query
  vector — the correctness baseline. JVM-side ``zip_with`` +
  ``aggregate`` dot products (no Python in the loop); top-k via
  ``orderBy().limit()`` which Spark executes as TakeOrdered (per
  partition heap + driver merge of k rows — no global sort shuffle).
- **knn_join_topk**: top-k neighbors for EVERY row of a query table
  (k-NN join) via a window over blocked candidates.
- **random_hyperplane_lsh**: the scale path — sign-of-projection LSH
  bucketing. Hyperplanes are derived deterministically from md5, so
  bucket assignment is reproducible across engines and runs (no RNG
  state to ship). At 100 TB: bucketing is a narrow projection; probing
  only joins on (table, bucket) — a broadcast-able equi-join key.
- **ivf_topk**: IVF-style two-stage search — coarse quantization to
  the nearest of C centroids, then exact search within the probed
  cells. Centroids here are sampled deterministically from the data
  (id-hash order) — a kmeans refinement can slot in without changing
  the query path.
- **cosine_near_dup_pairs**: embedding near-dup pairs (dedup by
  semantic similarity) using LSH blocking + exact verification.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from datacamp_etl_spark.functions import cosine_similarity, dot_product, l2_norm

__all__ = [
    "normalize_vector",
    "brute_force_topk",
    "knn_join_topk",
    "hard_negatives",
    "hard_negatives_lsh",
    "random_hyperplane_lsh",
    "lsh_topk",
    "ivf_topk",
    "kmeans_train",
    "cluster_balanced_sample",
    "semantic_dedup",
    "cosine_near_dup_pairs",
]


def normalize_vector(col: Column | str) -> Column:
    """Unit-normalize an array vector (cosine -> dot product)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = l2_norm(c)
    return F.when(norm != 0, F.transform(c, lambda x: x.cast("double") / norm))


def _query_lit(query: Sequence[float]) -> Column:
    return F.lit([float(x) for x in query]).cast("array<double>")


def brute_force_topk(
    df: DataFrame,
    query: Sequence[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """Exact cosine top-k vs a constant query vector:
    ``(id, cosine)`` ordered desc, ties broken by id.

    The query vector is a literal folded into the plan (broadcast by
    value); the scan is a single narrow projection -> TakeOrdered(k).
    ``cosine`` is rounded to ``decimals`` for cross-engine stability.
    """
    q = _query_lit(query)
    cos = cosine_similarity(F.col(vec_col), q)
    # NULL cosines (zero-norm vectors) are excluded BEFORE the top-k
    # truncation: they can never rank, and dropping them up front
    # keeps the pool full of scoreable rows (a NULL surviving into a
    # downstream rank/fusion stage would earn undeserved credit)
    return (
        df.select(F.col(id_col), F.round(cos, decimals).alias("cosine"))
        .where(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def knn_join_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    candidates: DataFrame | None = None,
    max_inline_queries: int = 128,
) -> DataFrame:
    """k-NN join: for each query row, its top-k corpus neighbors
    ``(query_id, neighbor_id, cosine, rank)``.

    Scale posture: with ``candidates`` (e.g. LSH bucket pairs), two
    equi-joins — the scale path for large query sets. Without it, the
    query set must be small (<= ``max_inline_queries``): the query
    vectors are collected and folded into the plan as literals, and
    each corpus row is exploded against them in ONE narrow scan — no
    join operator at all, so no CartesianProduct/BroadcastNestedLoop
    on the corpus side. A large query set without candidates raises
    rather than silently planning an all-pairs join.

    The ranking window partitions by query, so the heavy sort is
    per-query-key, AQE-splittable on skew.
    """
    qa = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    ca = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv")
    )
    if candidates is not None:
        joined = candidates.join(qa, "query_id").join(ca, "neighbor_id")
    else:
        qrows = qa.limit(max_inline_queries + 1).collect()
        if len(qrows) > max_inline_queries:
            raise ValueError(
                f"knn_join_topk without candidates is exact and inlines the "
                f"query set into the plan; got >{max_inline_queries} query "
                f"rows. Pass candidates= (e.g. LSH bucket pairs) for large "
                f"query sets, or raise max_inline_queries deliberately."
            )
        if not qrows:
            # Degenerate empty query set: preserve the output schema.
            joined = qa.crossJoin(ca)
        else:
            qlits = F.array(
                *[
                    F.struct(
                        F.lit(r["query_id"]).alias("query_id"),
                        F.array(
                            *[F.lit(float(x)) for x in r["__qv"]]
                        ).alias("__qv"),
                    )
                    for r in qrows
                ]
            )
            joined = ca.select(
                F.explode(qlits).alias("__q"), "neighbor_id", "__cv"
            ).select(
                F.col("__q.query_id").alias("query_id"),
                F.col("__q.__qv").alias("__qv"),
                "neighbor_id",
                "__cv",
            )
    joined = joined.where(F.col("query_id") != F.col("neighbor_id"))
    cos = cosine_similarity(F.col("__qv"), F.col("__cv"))
    # Rank on the ROUNDED cosine (+ id tiebreak): fully deterministic
    # across engines — raw-double ordering is summation-order-sensitive.
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        joined.select(
            "query_id", "neighbor_id", F.round(cos, 6).alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hard_negatives(
    anchors: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    max_inline_anchors: int = 128,
) -> DataFrame:
    """Hard-negative mining for contrastive training (the DPR /
    SimCLR recipe, Karpukhin et al. 2020): for each anchor, the
    ``k`` MOST SIMILAR corpus rows with a DIFFERENT label — close in
    embedding space yet known non-matches, the negatives that
    actually shape a contrastive margin (random negatives are too
    easy to teach anything).

    The label filter applies BEFORE the rank, so every anchor yields
    ``k`` negatives whenever that many cross-label rows exist — a
    post-filtered k-NN would return fewer. Same exact-path contract
    as :func:`knn_join_topk`: the anchor set is bounded
    (``max_inline_anchors``) and folded into the plan as literals —
    one narrow corpus scan, no join operator, never a cartesian; a
    larger anchor set should go through LSH candidates + an anti-join
    on the label instead. Ranking on rounded cosine + id tiebreak
    (cross-engine deterministic). Returns
    ``(query_id, neighbor_id, neighbor_label, cosine, rank)``.
    """
    arows = (
        anchors.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.col(label_col).alias("__ql"),
        )
        .limit(max_inline_anchors + 1)
        .collect()
    )
    if len(arows) > max_inline_anchors:
        raise ValueError(
            f"hard_negatives inlines the anchor set into the plan; got "
            f">{max_inline_anchors} anchors. Use "
            "datacamp_etl_spark.operators.similarity.hard_negatives_lsh "
            "(LSH bucket candidates + label anti-join — a distributed "
            "equi-join, no inlining bound) for large anchor sets, or "
            "raise max_inline_anchors deliberately."
        )
    ca = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        F.col(vec_col).alias("__cv"),
    )
    if not arows:
        joined = ca.crossJoin(
            anchors.select(
                F.col(id_col).alias("query_id"),
                F.col(vec_col).alias("__qv"),
                F.col(label_col).alias("__ql"),
            )
        )
    else:
        qlits = F.array(
            *[
                F.struct(
                    F.lit(r["query_id"]).alias("query_id"),
                    F.array(
                        *[F.lit(float(x)) for x in r["__qv"]]
                    ).alias("__qv"),
                    F.lit(r["__ql"]).alias("__ql"),
                )
                for r in arows
            ]
        )
        joined = ca.select(
            F.explode(qlits).alias("__q"),
            "neighbor_id",
            "neighbor_label",
            "__cv",
        ).select(
            F.col("__q.query_id").alias("query_id"),
            F.col("__q.__qv").alias("__qv"),
            F.col("__q.__ql").alias("__ql"),
            "neighbor_id",
            "neighbor_label",
            "__cv",
        )
    joined = joined.where(
        (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("__ql") != F.col("neighbor_label"))
    )
    cos = cosine_similarity(F.col("__qv"), F.col("__cv"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        joined.select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            F.round(cos, 6).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hard_negatives_lsh(
    anchors: DataFrame,
    corpus: DataFrame,
    *,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    num_planes: int = 8,
    decimals: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Hard-negative mining at scale — the LSH-candidates + label
    anti-join path :func:`hard_negatives`' inlining bound points at:
    for each anchor, the ``k`` most similar SAME-BUCKET corpus rows
    with a DIFFERENT label. Candidates must share the anchor's
    sign-projection bucket (``random_hyperplane_lsh``, md5-derived
    deterministic planes), so pair generation is a plain distributed
    EQUI-JOIN on the bucket id — no anchor inlining, no cross join,
    anchor sets of any size. Approximate like :func:`lsh_topk`:
    recall rises with fewer planes (bigger buckets).

    The label filter applies with the join (before the rank), same
    contract as the exact path. ``max_bucket_size`` (opt-in, default
    None) drops corpus rows in over-cap buckets — the mega-bucket
    guard for degenerate embedding clumps; leave None when the
    oracle/caller does not model the cap. Ranking on rounded cosine
    + id tiebreak. Returns
    ``(query_id, neighbor_id, neighbor_label, cosine, rank)``.
    """
    a = random_hyperplane_lsh(
        anchors.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("__qv"),
            F.col(label_col).alias("__ql"),
        ),
        vec_col="__qv",
        dim=dim,
        num_planes=num_planes,
        out_col="__qb",
    )
    c = random_hyperplane_lsh(
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(label_col).alias("neighbor_label"),
            F.col(vec_col).alias("__cv"),
        ),
        vec_col="__cv",
        dim=dim,
        num_planes=num_planes,
        out_col="__cb",
    )
    if max_bucket_size is not None:
        wcnt = W.partitionBy("__cb")
        c = (
            c.withColumn("__n", F.count("*").over(wcnt))
            .where(F.col("__n") <= max_bucket_size)
            .drop("__n")
        )
    joined = a.join(
        c,
        (F.col("__qb") == F.col("__cb"))
        & (F.col("query_id") != F.col("neighbor_id"))
        & (F.col("__ql") != F.col("neighbor_label")),
    )
    cos = cosine_similarity(F.col("__qv"), F.col("__cv"))
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        joined.select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            F.round(cos, decimals).alias("cosine"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------
# LSH (random hyperplane / sign projection)
# ---------------------------------------------------------------------

def _hyperplane(dim: int, plane: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component values in
    [-1, 1), derived from md5(plane:dim_index) — reproducible anywhere
    without RNG state."""
    import hashlib

    out = []
    for d in range(dim):
        h = hashlib.md5(f"{plane}:{d}".encode()).hexdigest()
        out.append((int(h[:8], 16) / 0x7FFFFFFF) - 1.0)
    return out


def random_hyperplane_lsh(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    num_planes: int = 8,
    out_col: str = "bucket",
) -> DataFrame:
    """Add an LSH bucket id: ``bucket = sum_j sign(v . h_j) * 2^j``.

    The planes are literal arrays folded into the plan (tiny:
    num_planes x dim doubles), so bucketing is a pure projection —
    shuffle-free, pushdown-friendly, identical across runs/engines.
    """
    bucket = F.lit(0)
    for j in range(num_planes):
        plane = F.array(*[F.lit(x) for x in _hyperplane(dim, j)])
        dp = dot_product(F.col(vec_col), plane)
        bucket = bucket + F.when(dp >= 0, F.lit(2**j)).otherwise(F.lit(0))
    return df.withColumn(out_col, bucket.cast("int"))


def lsh_topk(
    df: DataFrame,
    query: Sequence[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int = 8,
    decimals: int = 6,
) -> DataFrame:
    """Approximate top-k: score only rows in the query's LSH bucket.

    Same output shape as :func:`brute_force_topk`. Recall improves
    with fewer planes (bigger buckets) — at scale, tune
    ``num_planes`` so a bucket is ~1/2^planes of the corpus.
    """
    dim = len(query)
    bucketed = random_hyperplane_lsh(
        df, vec_col=vec_col, dim=dim, num_planes=num_planes
    )
    qbucket = 0
    for j in range(num_planes):
        plane = _hyperplane(dim, j)
        dp = sum(float(a) * b for a, b in zip(query, plane))
        if dp >= 0:
            qbucket += 2**j
    q = _query_lit(query)
    cos = cosine_similarity(F.col(vec_col), q)
    return (
        bucketed.where(F.col("bucket") == qbucket)
        .select(F.col(id_col), F.round(cos, decimals).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


# ---------------------------------------------------------------------
# IVF (inverted-file two-stage search)
# ---------------------------------------------------------------------

def ivf_topk(
    df: DataFrame,
    query: Sequence[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_cells: int = 16,
    num_probes: int = 4,
    decimals: int = 6,
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest of
    ``num_cells`` centroids (coarse quantization), search only the
    ``num_probes`` cells nearest the query.

    Centroids are the vectors of the ``num_cells`` smallest-md5(id)
    rows — a deterministic sample (kmeans refinement is a drop-in).
    The cell assignment is computed per-row against broadcast
    centroids (greatest-of-N expression — no shuffle); the probe
    filter is an ``isin`` over cell ids, so the exact-search scan
    prunes to ~num_probes/num_cells of the data.
    """
    centroids_rows = (
        df.select(id_col, vec_col)
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(num_cells)
        .collect()
    )
    centroids = [list(r[vec_col]) for r in centroids_rows]

    def nearest_cell(vc: Column) -> Column:
        # One similarity per centroid, materialized once into an array;
        # argmax = position of the first max (ties -> lowest cell id).
        # A when/otherwise fold would nest each step's expression inside
        # the next (O(2^cells) tree) and OOM the driver at plan time.
        sims = F.array(
            *[
                cosine_similarity(
                    vc, F.lit([float(x) for x in cen]).cast("array<double>")
                )
                for cen in centroids
            ]
        )
        return (F.array_position(sims, F.array_max(sims)) - 1).cast("int")

    def py_cos(a: Sequence[float], b: Sequence[float]) -> float:
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) ** 2 for x in a) ** 0.5
        nb = sum(float(y) ** 2 for y in b) ** 0.5
        return num / (na * nb) if na and nb else -2.0

    probe_cells = sorted(
        range(len(centroids)), key=lambda i: -py_cos(query, centroids[i])
    )[:num_probes]

    assigned = df.withColumn("__cell", nearest_cell(F.col(vec_col)))
    q = _query_lit(query)
    cos = cosine_similarity(F.col(vec_col), q)
    return (
        assigned.where(F.col("__cell").isin(probe_cells))
        .select(F.col(id_col), F.round(cos, decimals).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 8,
    dim: int = 64,
    exact: bool = False,
    max_exact_rows: int = 50_000,
) -> DataFrame:
    """Embedding near-dup pairs: ``(id_a, id_b, cosine)`` with cosine
    >= threshold.

    ``exact=False`` (default, the scale path): candidates must share
    an LSH bucket -> per-bucket self-join. ``exact=True`` compares all
    pairs (verification/small data only) and is size-guarded: it
    counts the input first and raises above ``max_exact_rows`` — the
    same contract as ``knn_join_topk``'s no-candidates path, so an
    O(n²) plan can never silently reach production scale. Raise
    ``max_exact_rows`` explicitly to override.
    """
    if exact:
        n = df.count()
        if n > max_exact_rows:
            raise ValueError(
                f"cosine_near_dup_pairs(exact=True) on {n} rows: the "
                f"all-pairs plan is O(n²); limit the input or raise "
                f"max_exact_rows (currently {max_exact_rows}) to force"
            )
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    else:
        bucketed = random_hyperplane_lsh(
            df, vec_col=vec_col, dim=dim, num_planes=num_planes
        )
        a = bucketed.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"), "bucket"
        )
        b = bucketed.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"), "bucket"
        )
        pairs = a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
    cos = cosine_similarity(F.col("__va"), F.col("__vb"))
    return (
        pairs.select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def kmeans_train(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    n_iter: int = 2,
    decimals: int = 6,
) -> DataFrame:
    """Lloyd's k-means over an embedding column — the IVF coarse
    quantizer's training step (drop-in for :func:`ivf_topk`'s sampled
    centroids). Returns ``(id, cluster, dist)`` with ``dist`` the
    squared L2 distance to the final assigned centroid, rounded to 4
    decimals.

    Execution model (the canonical Spark k-means shape, same as
    MLlib's): centroids live on the driver (k x dim doubles — bounded
    and tiny), each iteration ships them to tasks as closure
    literals, the executors compute per-row argmin assignment as one
    Arrow-batched numpy pass (:func:`~.vector_kernel.
    assign_nearest_centroid` — Spark's ``aggregate``/``zip_with``
    fold is CodegenFallback, i.e. interpreted per row x per centroid,
    and was the sf1 bottleneck) and the new means via ``posexplode``
    + ``groupBy(cluster, pos)`` — one map-side-combinable shuffle of
    (cluster, pos, sum, count) per iteration, never the raw vectors.
    Only k x dim aggregated means are collected between iterations,
    independent of corpus size.

    Determinism (the oracle replays this in SQL): init = vectors of
    the ``k`` smallest-``md5(id)`` rows; every centroid component is
    rounded to ``decimals`` each iteration (absorbs sum-order ulp
    drift); argmin ties break to the lowest cluster id; distance
    folds run left-to-right over dimensions in both engines.
    """
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))

    init_rows = (
        df.select(id_col, vec_col)
        .where(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0))
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    if not init_rows:
        raise ValueError("kmeans_train: no non-null embeddings to seed from")
    # ragged rows (malformed data) can't seed centroids: keep only the
    # modal dimension among the k seeds (ties -> larger dim) — zero
    # extra jobs, and the assign kernel masks mismatched rows anyway
    from collections import Counter

    lens = Counter(len(r[vec_col]) for r in init_rows)
    dim0 = max(lens, key=lambda d: (lens[d], d))
    centroids = [
        [round(float(x), decimals) for x in r[vec_col]]
        for r in init_rows
        if len(r[vec_col]) == dim0
    ]

    from .vector_kernel import assign_nearest_centroid

    def assign(frame: DataFrame) -> DataFrame:
        return assign_nearest_centroid(frame, centroids, vec_col=vec_col)

    for _ in range(n_iter):
        assigned = assign(df.select(id_col, vec_col))
        means = (
            assigned.select(
                "cluster", F.posexplode(dvec).alias("pos", "val")
            )
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("val"), decimals).alias("v"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "v"))
                ).alias("pv")
            )
            .select("cluster", F.col("pv.v").alias("c"))
            .collect()
        )
        new_cents = {r["cluster"]: [float(v) for v in r["c"]] for r in means}
        # clusters that lost every member keep their previous centroid
        centroids = [
            new_cents.get(i, centroids[i]) for i in range(len(centroids))
        ]

    final = assign(df.select(id_col, vec_col))
    return final.select(
        F.col(id_col),
        "cluster",
        F.round(F.col("__dist"), 4).alias("dist"),
    )


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int | None = None,
    n_iter: int = 2,
    threshold: float = 0.45,
    k_min: int = 8,
    target_cluster_rows: int = 250,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): cluster the embedding corpus with k-means, then
    search for near-duplicates only WITHIN each cluster — the cluster
    assignment replaces the O(n²) all-pairs scan with an equi-join on
    ``cluster``, the published recipe for embedding dedup at corpus
    scale.

    Returns ``(id, cluster, keep)``: ``keep`` is False iff some
    same-cluster row with a SMALLER id has cosine similarity >=
    ``threshold`` (rounded to 6 decimals — the engine-portable cosine
    contract of :func:`cosine_near_dup_pairs`). Exactly the
    lowest-id member of every semantic duplicate group survives
    within its cluster.

    Scale contract: k-means is the bounded-driver loop of
    :func:`kmeans_train` (k x dim doubles to the driver, map-side
    combinable shuffles). The within-cluster pair join is quadratic
    in CLUSTER size, not corpus size — so ``k`` MUST grow with the
    corpus. With ``k=None`` (the default) it is derived from a cheap
    count: ``k = max(k_min, ceil(n / target_cluster_rows))``, keeping
    expected cluster size bounded at ``target_cluster_rows`` no matter
    the corpus scale (SemDeDup uses tens of thousands of clusters at
    billion-document scale). Pass a literal ``k`` only for pinned
    replays. Skewed (mega-) clusters are AQE skew-join territory;
    shrink them by lowering ``target_cluster_rows``.
    """
    if k is None:
        import math

        # narrow count (parquet footer / map-side) — the only driver
        # value needed is one long
        n = df.select(id_col).count()
        k = max(k_min, math.ceil(n / target_cluster_rows))
    assign = kmeans_train(
        df, id_col=id_col, vec_col=vec_col, k=k, n_iter=n_iter
    ).drop("dist")
    dvec = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # Within-cluster pair scoring runs as a blocked unit-vector
    # matmul per cluster group (vector_kernel.semantic_keep_by_
    # cluster), NOT a cluster self-join: the join form evaluates an
    # interpreted array fold per candidate pair (CodegenFallback) —
    # at sf1 that was 38+ min on one core; the matmul kernel does the
    # same pairs in seconds, and the applyInPandas shuffle by
    # `cluster` spreads clusters across the executors. Zero-norm
    # vectors keep the NULL-cosine contract (never drop, never
    # dropped) via the kernel's validity mask.
    from .vector_kernel import semantic_keep_by_cluster

    emb = df.select(F.col(id_col), dvec.alias("__v")).join(assign, id_col)
    return semantic_keep_by_cluster(
        emb, id_col=id_col, vec_col="__v", threshold=threshold
    )


def cluster_balanced_sample(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 4,
    n_iter: int = 2,
    per_cluster: int = 25,
) -> DataFrame:
    """Cluster-balanced data selection: k-means the embedding corpus
    (:func:`kmeans_train`) and keep an EQUAL deterministic quota from
    every cluster — the curation move that stops a web-scale corpus's
    dominant mode (boilerplate-adjacent text) from also dominating
    the training sample; per-cluster quotas flatten the density the
    same way temperature flattening does per-source, but along
    semantic axes no source label captures.

    Selection within a cluster is the md5-rank idiom
    (:func:`~.curation.hash_sample`'s determinism contract): order by
    ``(md5(id), id)``, keep the first ``per_cluster`` — reproducible
    on any engine, no RNG state. Clusters smaller than the quota
    contribute everything they have.

    Scale shape: the k-means pass is the documented bounded-collect
    Lloyd's (only k x dim means cross the driver); the quota pass is
    ONE window over the assignment table partitioned by cluster —
    skew bounded by cluster size, which is exactly what the k-means
    step controls. Returns ``(id_col, cluster, pick_rank)``.
    """
    from pyspark.sql import Window as W

    assigned = kmeans_train(
        df, id_col=id_col, vec_col=vec_col, k=k, n_iter=n_iter
    )
    w = W.partitionBy("cluster").orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    return (
        assigned.withColumn("pick_rank", F.row_number().over(w))
        .where(F.col("pick_rank") <= per_cluster)
        .select(
            id_col,
            "cluster",
            F.col("pick_rank").cast("long").alias("pick_rank"),
        )
    )
