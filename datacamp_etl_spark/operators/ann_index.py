"""Persisted IVF-PQ ANN index lifecycle [EXT]: build / save / load /
append / probe / staleness, with the index materialized as parquet
tables instead of retrained per query.

The in-session operators (:mod:`~datacamp_etl_spark.operators.pq`)
train the coarse and fine quantizers on every call — correct for a
one-shot query, wrong for a production corpus: a real 100 TB vector
store builds the index ONCE, persists it, and serves probes and
incremental appends against the frozen quantizers (the same
lifecycle the MinHash corpus dedup index already has —
``dedup.band_signatures`` / ``dedup.incremental_dedup``; reference
analog: the staging-table reuse pattern, ``loading.rb:224-230``).

Storage layout (all plain parquet, so any Spark session — or DuckDB —
can read it back)::

    <path>/meta/        1 row: format version, dim, m, k, sub_dim,
                        num_cells, decimals, n_generations
    <path>/centroids/   (cell int, centroid array<double>)   [coarse]
    <path>/codebooks/   (s int, code int, centroid array<double>)
    <path>/postings/    partitioned by cell:
                        (vec_id, codes array<int>, generation int)

Scale posture:
- ``postings`` is written ``partitionBy("cell")`` — the IVF inverted
  file realized as parquet partitions, so a probe reads ONLY the
  probed cells' files (static partition pruning; check
  ``.explain`` for ``PartitionFilters: [cell IN (...)]``). The float
  vectors are never stored in the index: a posting is m small codes.
- Loading an index collects ``meta`` (1 row), ``centroids``
  (num_cells rows) and ``codebooks`` (m*k rows) — bounded,
  corpus-size-independent, same contract as every other bounded
  collect in the repo (centroids / codebooks / vocab heads).
- ``append`` encodes new vectors with the FROZEN quantizers (no
  retrain, no corpus re-scan) and appends postings into the cell
  partitions it touches; generations are stamped so staleness is
  measurable.
- ``cell_stats`` is the re-index trigger: per-cell posting counts and
  the appended share. When appends concentrate in a few cells (data
  drift away from the trained centroids), probe cost and recall both
  degrade — rebuild.

Determinism (so the DuckDB oracle replays build + append + probe
end-to-end): the coarse quantizer is the md5-ordered centroid sample
with round-6 cosine argmax assignment (ties to the lowest cell,
zero-norm rows coalesced to the -2.0 sentinel) — exactly
``pq.ivfpq_topk``'s contract; the fine quantizer is
``pq.pq_train(n_iter=0)``'s md5-sampled codebooks with lowest-code
argmin encode. Doubles round-trip parquet bit-exactly, so the loaded
quantizers equal the trained ones.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datacamp_etl_spark.operators.pq import pq_train

__all__ = [
    "AnnIndex",
    "ann_index_build",
    "ann_index_load",
    "ann_index_append",
    "ann_index_query",
    "ann_index_cell_stats",
    "streaming_ann_filter",
]

ANN_INDEX_FORMAT_VERSION = 1


@dataclass(frozen=True)
class AnnIndex:
    """A loaded index handle: bounded quantizer state on the driver,
    postings left distributed (referenced lazily by path)."""

    path: str
    dim: int
    m: int
    k: int
    sub_dim: int
    num_cells: int
    decimals: int
    n_generations: int
    centroids: list[list[float]]  # centroids[cell]
    codebooks: list[list[list[float]]]  # codebooks[s][code]


def _py_cos(a: list[float], b: list[float]) -> float:
    """Driver-side cosine with the repo's zero-norm sentinel (-2.0) —
    must match functions.cosine_similarity + the coalesce in
    :func:`_cell_expr` (pq.ivfpq_topk's probe contract)."""
    num = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(y * y for y in b) ** 0.5
    return num / (na * nb) if na and nb else -2.0


def _sql_arr(vals: list[float]) -> str:
    """A double array literal as SQL text; repr round-trips IEEE
    doubles exactly through the parser."""
    return "array(" + ", ".join(f"{float(x)!r}D" for x in vals) + ")"


def _cell_sql(vec_col: str, centroids: list[list[float]]) -> str:
    """Round-6 cosine argmax cell assignment (ties -> lowest cell,
    zero-norm -> -2.0 sentinel) as ONE generated SQL expression —
    semantically identical to pq.ivfpq_topk's Column version
    (functions.cosine_similarity: zip_with/aggregate dot + norms,
    NULL on zero den), but built as text so plan construction is one
    parser call instead of thousands of Py4J round-trips (quantizer
    size x dim expression nodes)."""

    def cos(cen: list[float]) -> str:
        c = _sql_arr(cen)
        num = (
            f"aggregate(zip_with(`{vec_col}`, {c}, (x, y) -> "
            f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, "
            f"(acc, x) -> acc + x)"
        )
        den = (
            f"(sqrt(aggregate(`{vec_col}`, 0.0D, (acc, x) -> "
            f"acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) * "
            f"sqrt(aggregate({c}, 0.0D, (acc, x) -> "
            f"acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        )
        return (
            f"round(coalesce(CASE WHEN {den} != 0 THEN {num} / {den} "
            f"END, -2.0D), 6)"
        )

    sims = "array(" + ", ".join(cos(cen) for cen in centroids) + ")"
    return (
        f"CAST(array_position({sims}, array_max({sims})) - 1 AS INT)"
    )


def _codes_sql(
    vec_col: str, codebooks: list[list[list[float]]]
) -> str:
    """PQ encode (argmin per subspace, ties to the lowest code) as
    one generated SQL expression — same math as pq._code/_slice."""
    sub_dim = len(codebooks[0][0])

    def sqd(s: int, cen: list[float]) -> str:
        sub = (
            f"transform(slice(`{vec_col}`, {s * sub_dim + 1}, "
            f"{sub_dim}), x -> CAST(x AS DOUBLE))"
        )
        return (
            f"aggregate(zip_with({sub}, {_sql_arr(cen)}, "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v)"
        )

    def code(s: int, book: list[list[float]]) -> str:
        d = "array(" + ", ".join(sqd(s, cen) for cen in book) + ")"
        return f"CAST(array_position({d}, array_min({d})) - 1 AS INT)"

    return (
        "array("
        + ", ".join(code(s, book) for s, book in enumerate(codebooks))
        + ")"
    )


def _encode_postings(
    df: DataFrame,
    centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str,
    vec_col: str,
    generation: int,
) -> DataFrame:
    """(id, cell, codes, generation) for every input vector — one
    narrow, shuffle-free projection; quantizers ride along as
    broadcast literals (generated-SQL expressions, see _cell_sql)."""
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.expr(_cell_sql(vec_col, centroids)).alias("cell"),
        F.expr(_codes_sql(vec_col, codebooks)).alias("codes"),
        F.lit(generation).cast("int").alias("generation"),
    )


def _write_small(path: str, table) -> None:
    """Overwrite a one-file parquet DIRECTORY (Spark-readable layout)
    with driver-side pyarrow — the quantizer tables are bounded
    driver data (1 + num_cells + m*k rows); a Spark write job per
    table is pure overhead (~1-2 s each of commit protocol for a
    few-KB file)."""
    import shutil

    import pyarrow.parquet as pq_

    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    pq_.write_table(table, os.path.join(path, "part-00000.parquet"))


def _write_meta(spark: SparkSession, path: str, meta: dict) -> None:
    import pyarrow as pa

    _write_small(
        f"{path}/meta",
        pa.table(
            {
                "version": pa.array(
                    [ANN_INDEX_FORMAT_VERSION], pa.int32()
                ),
                "dim": pa.array([meta["dim"]], pa.int32()),
                "m": pa.array([meta["m"]], pa.int32()),
                "k": pa.array([meta["k"]], pa.int32()),
                "sub_dim": pa.array([meta["sub_dim"]], pa.int32()),
                "num_cells": pa.array([meta["num_cells"]], pa.int32()),
                "decimals": pa.array([meta["decimals"]], pa.int32()),
                "n_generations": pa.array(
                    [meta["n_generations"]], pa.int32()
                ),
            }
        ),
    )


def ann_index_build(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_cells: int = 16,
    m: int = 4,
    k: int = 4,
    n_iter: int = 0,
    decimals: int = 6,
    dim: int | None = None,
) -> None:
    """Train the coarse + fine quantizers on ``df`` and persist the
    full index (meta, centroids, codebooks, cell-partitioned
    postings) at ``path``. Build is the only step that scans the
    corpus vectors; everything after runs against the saved tables."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")

    centroid_rows = (
        df.select(id_col, vec_col)
        .withColumn("__h", F.md5(F.col(id_col).cast("string")))
        .orderBy("__h")
        .limit(num_cells)
        .collect()
    )
    centroids = [[float(x) for x in r[vec_col]] for r in centroid_rows]
    books = pq_train(
        df, id_col=id_col, vec_col=vec_col, m=m, k=k, n_iter=n_iter,
        dim=dim, decimals=decimals,
    )

    import pyarrow as pa

    _write_small(
        f"{path}/centroids",
        pa.table(
            {
                "cell": pa.array(range(len(centroids)), pa.int32()),
                "centroid": pa.array(
                    centroids, pa.list_(pa.float64())
                ),
            }
        ),
    )
    flat = [
        (s, c, books[s][c])
        for s in range(m)
        for c in range(len(books[s]))
    ]
    _write_small(
        f"{path}/codebooks",
        pa.table(
            {
                "s": pa.array([r[0] for r in flat], pa.int32()),
                "code": pa.array([r[1] for r in flat], pa.int32()),
                "centroid": pa.array(
                    [r[2] for r in flat], pa.list_(pa.float64())
                ),
            }
        ),
    )

    _encode_postings(
        df, centroids, books, id_col, vec_col, generation=0
    ).write.mode("overwrite").partitionBy("cell").parquet(
        f"{path}/postings"
    )
    _write_meta(
        spark,
        path,
        {
            "dim": dim,
            "m": m,
            "k": k,
            "sub_dim": dim // m,
            "num_cells": num_cells,
            "decimals": decimals,
            "n_generations": 1,
        },
    )


def _read_small(path: str) -> list[dict]:
    """Driver-side read of a bounded quantizer table (pyarrow — no
    Spark job for a few-KB file; the dir stays Spark-readable for
    external consumers)."""
    import glob

    import pyarrow.parquet as pq_

    out: list[dict] = []
    # glob *.parquet so Spark-written dirs (_SUCCESS markers) read too
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        out.extend(pq_.read_table(f).to_pylist())
    return out


def ann_index_load(spark: SparkSession, path: str) -> AnnIndex:
    """Load the bounded quantizer state (1 + num_cells + m*k rows) —
    never the postings."""
    [meta] = _read_small(f"{path}/meta")
    if meta["version"] != ANN_INDEX_FORMAT_VERSION:
        raise ValueError(
            f"unsupported ann index version {meta['version']}"
        )
    cen_rows = _read_small(f"{path}/centroids")
    centroids = [None] * len(cen_rows)
    for r in cen_rows:
        centroids[r["cell"]] = [float(x) for x in r["centroid"]]
    book_rows = _read_small(f"{path}/codebooks")
    books: list[list[list[float]]] = [
        [None] * meta["k"] for _ in range(meta["m"])
    ]
    for r in book_rows:
        books[r["s"]][r["code"]] = [float(x) for x in r["centroid"]]
    return AnnIndex(
        path=path,
        dim=meta["dim"],
        m=meta["m"],
        k=meta["k"],
        sub_dim=meta["sub_dim"],
        num_cells=meta["num_cells"],
        decimals=meta["decimals"],
        n_generations=meta["n_generations"],
        centroids=centroids,
        codebooks=books,
    )


def ann_index_append(
    spark: SparkSession,
    path: str,
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> int:
    """Incrementally add vectors to a persisted index: encode with
    the FROZEN quantizers (loaded, not retrained), append postings
    into the touched cell partitions, bump the generation counter.
    Returns the generation stamped on the new postings. Mirrors
    ``dedup.incremental_dedup``'s batch-vs-persisted-index shape: the
    existing index is never re-scanned."""
    idx = ann_index_load(spark, path)
    gen = idx.n_generations
    _encode_postings(
        df, idx.centroids, idx.codebooks, id_col, vec_col, generation=gen
    ).write.mode("append").partitionBy("cell").parquet(f"{path}/postings")
    _write_meta(
        spark,
        path,
        {
            "dim": idx.dim,
            "m": idx.m,
            "k": idx.k,
            "sub_dim": idx.sub_dim,
            "num_cells": idx.num_cells,
            "decimals": idx.decimals,
            "n_generations": gen + 1,
        },
    )
    return gen


def ann_index_query(
    spark: SparkSession,
    path: str,
    query: list[float],
    *,
    topk: int = 10,
    num_probes: int = 4,
) -> DataFrame:
    """Probe a persisted index: pick the ``num_probes`` cells nearest
    the query (driver-side, against the loaded centroids), scan ONLY
    those cells' postings (parquet partition pruning on the
    cell-partitioned layout), ADC-score from codes, TakeOrdered.
    No retraining, no full-corpus scan, no float vector read.
    Returns ``(vec_id, adc_dist)`` smallest first, id tie-break."""
    idx = ann_index_load(spark, path)
    q = [float(x) for x in query]
    probe = sorted(
        range(len(idx.centroids)),
        key=lambda i: (-round(_py_cos(q, idx.centroids[i]), 6), i),
    )[:num_probes]

    lut = [
        [
            sum(
                (q[s * idx.sub_dim + i] - cen[i]) ** 2
                for i in range(idx.sub_dim)
            )
            for cen in idx.codebooks[s]
        ]
        for s in range(idx.m)
    ]
    postings = spark.read.parquet(f"{path}/postings").where(
        F.col("cell").isin([int(c) for c in probe])
    )
    dist = None
    for s in range(idx.m):
        term = F.element_at(
            F.lit(lut[s]).cast("array<double>"),
            F.element_at("codes", s + 1) + 1,
        )
        dist = term if dist is None else dist + term
    return (
        postings.select(
            "vec_id", F.round(dist, idx.decimals).alias("adc_dist")
        )
        .orderBy("adc_dist", "vec_id")
        .limit(topk)
    )


def ann_index_cell_stats(spark: SparkSession, path: str) -> DataFrame:
    """Staleness / drift report over the persisted postings: per cell,
    the base-build count, the appended count and the total's share in
    millionths. Appends concentrating in a few cells mean the data
    has drifted away from the trained coarse centroids — probe cost
    and recall degrade together; large ``share_ppm`` spread (vs the
    uniform 1e6/num_cells) is the rebuild trigger. One aggregated
    scan of the codes-only postings (never the vectors); the grand
    total is a 1-row scalar broadcast onto the bounded
    (<= num_cells)-row per-cell table."""
    per_cell = (
        spark.read.parquet(f"{path}/postings")
        .groupBy("cell")
        .agg(
            F.sum(
                F.when(F.col("generation") == 0, 1).otherwise(0)
            ).alias("n_base"),
            F.sum(
                F.when(F.col("generation") > 0, 1).otherwise(0)
            ).alias("n_appended"),
            F.count("*").alias("n_total"),
        )
    )
    total = per_cell.agg(F.sum("n_total").alias("__grand"))
    return (
        per_cell.crossJoin(F.broadcast(total))
        .select(
            F.col("cell").cast("int").alias("cell"),
            F.col("n_base").cast("long").alias("n_base"),
            F.col("n_appended").cast("long").alias("n_appended"),
            F.col("n_total").cast("long").alias("n_total"),
            # integer DIV, not float /: the ppm share must be the
            # exact floor both engines compute identically
            F.expr("(1000000 * n_total) DIV __grand")
            .cast("long")
            .alias("share_ppm"),
        )
        .orderBy("cell")
    )


def _adc_dist_sql(
    vec_col: str,
    codes_col: str,
    codebooks: list[list[list[float]]],
) -> str:
    """ADC distance between a live vector column and a persisted
    posting's codes, as one generated SQL expression: per subspace,
    the vector-to-centroid squared distances form an inline LUT array
    and the posting's code indexes it — the streaming-legal form of
    pq_topk's driver-built LUT (here the 'query' is every arriving
    row, so the LUT must be an expression over it)."""
    sub_dim = len(codebooks[0][0])

    def sqd(s: int, cen: list[float]) -> str:
        sub = (
            f"transform(slice(`{vec_col}`, {s * sub_dim + 1}, "
            f"{sub_dim}), x -> CAST(x AS DOUBLE))"
        )
        return (
            f"aggregate(zip_with({sub}, {_sql_arr(cen)}, "
            f"(x, y) -> (x - y) * (x - y)), 0.0D, (acc, v) -> acc + v)"
        )

    terms = []
    for s, book in enumerate(codebooks):
        lut = "array(" + ", ".join(sqd(s, cen) for cen in book) + ")"
        terms.append(
            f"element_at({lut}, element_at(`{codes_col}`, {s + 1}) + 1)"
        )
    return "round(" + " + ".join(terms) + ", 6)"


def streaming_ann_filter(
    stream: DataFrame,
    spark: SparkSession,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_dist: float = 1.0,
) -> DataFrame:
    """Streaming SEMANTIC near-dup gate against a persisted ANN
    index: an arriving vector passes only if NO posting in ITS OWN
    coarse cell sits within ``max_dist`` ADC distance — the vector
    twin of ``dedup.streaming_near_dup_filter``'s band-collision
    gate, and the online-ingest half of the persisted-index
    lifecycle (build once offline; every arriving batch/stream row
    probes the frozen quantizers).

    Entirely STATELESS: the cell assignment and the per-pair ADC
    distance are generated-SQL expressions over the arriving row
    (the LUT that pq_topk builds driver-side per query becomes an
    inline expression, because here every row IS a query), and the
    gate is ONE stream-static left_anti join on the cell key with
    the distance bound as a residual join filter — no watermark, no
    state store. The static side reads the cell-partitioned postings
    (codes only, never vectors).

    Conservative by design (same caveat as the band gate): only the
    row's own argmax cell is probed, so a near-dup straddling a cell
    boundary can slip through — the documented IVF probe trade; raise
    coverage by rebuilding with more probes offline.
    """
    idx = ann_index_load(spark, path)
    postings = spark.read.parquet(f"{path}/postings").select(
        F.col("cell").alias("__pcell"), F.col("codes").alias("__pcodes")
    )
    cell = F.expr(_cell_sql(vec_col, idx.centroids))
    dist = F.expr(
        _adc_dist_sql(vec_col, "__pcodes", idx.codebooks)
    )
    enriched = stream.withColumn("__cell", cell)
    cond = (F.col("__cell") == F.col("__pcell")) & (
        dist < F.lit(float(max_dist))
    )
    return enriched.join(postings, cond, "left_anti").drop("__cell")
