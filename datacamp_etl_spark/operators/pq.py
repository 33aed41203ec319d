"""Product quantization (PQ) for billion-scale ANN [EXT].

The memory-scale path beyond scalar quantization
(:mod:`~datacamp_etl_spark.operators.quantize`): split each vector
into ``m`` subvectors, k-means each subspace independently, and store
each vector as ``m`` small codes (Jégou et al., "Product Quantization
for Nearest Neighbor Search", TPAMI 2011). Search uses ADC
(asymmetric distance computation): per query, a tiny ``m x k`` lookup
table of query-subvector-to-centroid distances is built once and each
corpus vector's distance is approximated as ``sum(lut[s][code_s])`` —
no float vector ever touched at probe time.

Spark execution model (mirrors ``similarity.kmeans_train``,
similarity.py:345):
- Training: codebooks live on the driver (m x k x sub_dim doubles —
  bounded, tiny); each Lloyd iteration broadcasts them as literals,
  executors fold argmin per subspace (JVM ``aggregate``/``zip_with``
  codegen, no UDF), and new means arrive via ONE
  explode + groupBy(subspace, cluster, pos) shuffle of aggregated
  (sum,count) cells — never raw vectors.
- Encoding: a narrow shuffle-free projection.
- ADC probe: the LUT is an ``m x k`` literal; distance is an m-term
  sum of array lookups; top-k is a TakeOrdered, never a full sort.

Determinism (so the DuckDB oracle can replay encode+probe exactly):
init centroids = subvector slices of the ``k`` smallest-``md5(id)``
rows; per-iteration means rounded to 6 decimals; argmin ties break to
the lowest code; distances fold left-to-right.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "pq_train",
    "pq_encode",
    "pq_topk",
    "ivfpq_topk",
    "ivfpq_rerank",
]


def _slice(vec: Column, s: int, sub_dim: int) -> Column:
    """Subvector ``s`` (0-based) as array<double>; F.slice is 1-based."""
    return F.transform(
        F.slice(vec, s * sub_dim + 1, sub_dim), lambda x: x.cast("double")
    )


def _sqdist(sub: Column, cen: list[float]) -> Column:
    # one array literal, not per-element F.lit calls: centroid
    # expression trees dominate plan-construction time otherwise
    # (hundreds of Py4J round-trips per codebook)
    clit = F.lit([float(x) for x in cen]).cast("array<double>")
    return F.aggregate(
        F.zip_with(sub, clit, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _code(sub: Column, book: list[list[float]]) -> Column:
    """Argmin centroid index within one subspace codebook (ties to the
    lowest index — array_position returns the FIRST match)."""
    dists = F.array(*[_sqdist(sub, cen) for cen in book])
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def pq_train(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    k: int = 4,
    n_iter: int = 1,
    dim: int | None = None,
    decimals: int = 6,
    _init_rows: list | None = None,
) -> list[list[list[float]]]:
    """Train ``m`` subspace codebooks of ``k`` centroids each.
    Returns ``codebooks[s][c] = centroid vector (sub_dim doubles)``.
    ``n_iter=0`` keeps the deterministic init (sampled rows) as the
    codebook — the oracle-replayable configuration.

    ``_init_rows``: a caller that has ALREADY collected >= ``k`` rows
    in the md5(id) sample order (``ivfpq_topk``'s coarse-centroid
    collect uses the identical ordering) may pass them to skip the
    init job — the first ``k`` rows of that order ARE this function's
    init sample, so the codebooks are bit-identical."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub_dim = dim // m

    init_rows = (
        list(_init_rows)[:k]
        if _init_rows is not None and len(_init_rows) >= k
        else df.select(id_col, vec_col)
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(k)
        .collect()
    )
    books = [
        [
            [round(float(x), decimals) for x in r[vec_col]][
                s * sub_dim : (s + 1) * sub_dim
            ]
            for r in init_rows
        ]
        for s in range(m)
    ]

    vec = F.col(vec_col)
    for _ in range(n_iter):
        # one explode: (subspace, cluster, subvector) structs, then
        # per-(s, cluster, pos) means in a single aggregated shuffle
        entries = F.array(
            *[
                F.struct(
                    F.lit(s).alias("s"),
                    _code(_slice(vec, s, sub_dim), books[s]).alias("c"),
                    _slice(vec, s, sub_dim).alias("v"),
                )
                for s in range(m)
            ]
        )
        cells = (
            df.select(F.explode(entries).alias("e"))
            .select("e.s", "e.c", F.posexplode("e.v").alias("pos", "val"))
            .groupBy("s", "c", "pos")
            .agg(F.round(F.avg("val"), decimals).alias("v"))
            .collect()
        )
        new: dict[tuple[int, int], dict[int, float]] = {}
        for r in cells:
            new.setdefault((r["s"], r["c"]), {})[r["pos"]] = float(r["v"])
        for s in range(m):
            for c in range(k):
                got = new.get((s, c))
                if got:  # empty clusters keep their previous centroid
                    books[s][c] = [got[p] for p in range(sub_dim)]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode every vector as ``m`` codes: (id, codes array<int>).
    Narrow, shuffle-free, codegen'd."""
    sub_dim = len(codebooks[0][0])
    vec = F.col(vec_col)
    codes = F.array(
        *[
            _code(_slice(vec, s, sub_dim), book)
            for s, book in enumerate(codebooks)
        ]
    )
    return df.select(F.col(id_col), codes.alias("codes"))


def pq_topk(
    codes_df: DataFrame,
    codebooks: list[list[list[float]]],
    query: list[float],
    *,
    id_col: str = "vec_id",
    topk: int = 10,
    decimals: int = 6,
) -> DataFrame:
    """ADC top-k: build the ``m x k`` query-to-centroid LUT on the
    driver, approximate each corpus distance as the m-term LUT sum,
    TakeOrdered the smallest. Ties break on the id column."""
    m = len(codebooks)
    sub_dim = len(codebooks[0][0])
    lut = [
        [
            sum(
                (query[s * sub_dim + i] - cen[i]) ** 2
                for i in range(sub_dim)
            )
            for cen in codebooks[s]
        ]
        for s in range(m)
    ]
    dist = None
    for s in range(m):
        term = F.element_at(
            F.lit(lut[s]).cast("array<double>"),
            F.element_at("codes", s + 1) + 1,
        )
        dist = term if dist is None else dist + term
    return (
        codes_df.select(
            F.col(id_col), F.round(dist, decimals).alias("adc_dist")
        )
        .orderBy("adc_dist", id_col)
        .limit(topk)
    )


def ivfpq_topk(
    df: DataFrame,
    query: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 10,
    num_cells: int = 16,
    num_probes: int = 4,
    m: int = 4,
    k: int = 4,
    decimals: int = 6,
) -> DataFrame:
    """IVF-PQ: the billion-scale ANN recipe (FAISS ``IVFx,PQy``,
    Jégou et al. 2011 §V) — coarse inverted-file pruning picks the
    ``num_probes`` cells nearest the query, then PQ-ADC approximates
    distances INSIDE the probed cells only. Two multiplicative
    savings: the scan prunes to ~probes/cells of the corpus, and the
    scanned part never touches a float vector (an m-term LUT sum per
    row). At 100 TB this is the configuration that actually runs:
    IVF alone still scans full vectors; PQ alone scans every row.

    Composition of the two registered operators with their exact
    determinism contracts: the coarse quantizer is ``ivf_topk``'s
    md5-ordered centroid sample + cosine-argmax assignment
    (similarity.py:247); the fine quantizer is ``pq_train(n_iter=0)``'s
    md5-sampled codebooks + lowest-code argmin encode. The probed-cell
    filter runs BEFORE encode, so codes are only computed for scanned
    rows. Returns ``(id, adc_dist)``, smallest first, id tie-break.
    """
    from datacamp_etl_spark.functions import cosine_similarity

    # Coarse quantizer: deterministic centroid sample (kmeans-refined
    # drop-in), nearest-cell argmax per row, query-side probe list.
    centroid_rows = (
        df.select(id_col, vec_col)
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(num_cells)
        .collect()
    )
    centroids = [
        [float(x) for x in r[vec_col]] for r in centroid_rows
    ]
    # Round to the repo-wide 6 decimals BEFORE the argmax (consistent
    # with the adc_dist contract) so a near-tie cannot flip the cell
    # choice between the three float implementations involved (Spark
    # JVM fold, Python _py_cos, DuckDB list_cosine_similarity), and
    # coalesce zero-norm rows to the -2.0 sentinel (_py_cos's own
    # zero-norm contract) so they keep a cell instead of being
    # silently dropped by a NULL argmax.
    sims = F.array(
        *[
            F.round(
                F.coalesce(
                    cosine_similarity(
                        F.col(vec_col),
                        F.lit([float(x) for x in cen]).cast(
                            "array<double>"
                        ),
                    ),
                    F.lit(-2.0),
                ),
                6,
            )
            for cen in centroids
        ]
    )
    cell = (F.array_position(sims, F.array_max(sims)) - 1).cast("int")

    def _py_cos(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return num / (na * nb) if na and nb else -2.0

    q = [float(x) for x in query]
    probe = sorted(
        range(len(centroids)),
        key=lambda i: (-round(_py_cos(q, centroids[i]), 6), i),
    )[:num_probes]

    scanned = df.withColumn("__cell", cell).where(
        F.col("__cell").isin(probe)
    )

    # Fine quantizer: PQ codebooks trained on the FULL corpus (the
    # codebook must not depend on the query's probe set), ADC on the
    # scanned subset only. The coarse-centroid collect above already
    # fetched >= k rows in pq_train's exact md5(id) init order, so
    # passing them skips pq_train's own init job AND its dim-probe
    # first() — two driver round-trips removed, codebooks unchanged.
    books = pq_train(
        df,
        id_col=id_col,
        vec_col=vec_col,
        m=m,
        k=k,
        n_iter=0,
        dim=len(centroids[0]) if centroids else None,
        _init_rows=centroid_rows if len(centroid_rows) >= k else None,
    )
    codes = pq_encode(scanned, books, id_col=id_col, vec_col=vec_col)
    return pq_topk(
        codes, books, q, id_col=id_col, topk=topk, decimals=decimals
    )


def ivfpq_rerank(
    df: DataFrame,
    query: list[float],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    topk: int = 10,
    shortlist: int = 50,
    num_cells: int = 16,
    num_probes: int = 4,
    m: int = 4,
    k: int = 4,
    decimals: int = 6,
) -> DataFrame:
    """IVF-PQ search with exact re-ranking — the full production ANN
    recipe (FAISS's refine stage / Jégou et al. 2011 §V.D): the
    compressed-domain ADC scan shortlists ``shortlist`` candidates
    cheaply, then ONLY those rows' real vectors are read for an exact
    cosine ordering. ADC distance error (PQ quantization noise) decides
    nothing final — it only has to keep the true neighbors inside a
    shortlist a few times larger than ``topk``.

    Returns ``(id, cos_sim)``, best first, id tie-break. Zero-norm
    vectors may enter the SHORTLIST (ivfpq_topk's -2.0 cell-assignment
    sentinel keeps them scannable) but are DROPPED by the exact stage,
    matching ``brute_force_topk``'s contract — an unscoreable vector
    must not fill a final top-k slot that a rank/fusion stage would
    credit.

    Scale shape: all the IVF-PQ savings of :func:`ivfpq_topk` for the
    scan, plus one LEFT SEMI join on the id to fetch the ``shortlist``
    full vectors (at scale: an id-bucketed point lookup, reading
    ``shortlist`` rows of float data total) and a ``topk`` TakeOrdered
    over ``shortlist`` rows — the exact stage's cost is independent of
    the corpus size.
    """
    from datacamp_etl_spark.functions import cosine_similarity

    if shortlist < topk:
        raise ValueError(
            f"shortlist ({shortlist}) must be >= topk ({topk})"
        )
    short = ivfpq_topk(
        df,
        query,
        id_col=id_col,
        vec_col=vec_col,
        topk=shortlist,
        num_cells=num_cells,
        num_probes=num_probes,
        m=m,
        k=k,
        decimals=decimals,
    )
    q_arr = F.lit([float(x) for x in query]).cast("array<double>")
    exact = (
        df.join(short.select(id_col), id_col, "left_semi")
        .select(
            id_col,
            F.round(
                cosine_similarity(F.col(vec_col), q_arr), decimals
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim").isNotNull())
    )
    return exact.orderBy(F.desc("cos_sim"), id_col).limit(topk)
