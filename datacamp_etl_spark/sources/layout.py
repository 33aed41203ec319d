"""Physical-layout operators [EXT] — the write-side half of 100 TB
performance.

Query-side scale (pushdown, pruning, broadcast) is only as good as the
layout underneath it. Three operators manage that layout:

- :func:`write_sorted` — partitioned write with an in-partition sort,
  so parquet row-group min/max statistics become data-skipping indexes
  (the poor-man's Z-order: range-partition + sort on the hot predicate
  column means a point/range query touches few files).
- :func:`write_bucketed` — hash-bucketed, bucket-sorted table: two
  tables bucketed on their join key sort-merge join with ZERO
  exchanges (the K7 "index" analog that actually matters on Spark —
  see ``tests/test_plans.py`` zero-exchange guardrail).
- :func:`compact` — the small-files fixer. Streaming/incremental
  ingest leaves thousands of KB-sized files per partition; scan
  startup cost is per-file, so at 100 TB compaction is the difference
  between a scan bounded by IO and one bounded by file-open latency.
  Rewrites to a scratch path and atomically swaps (same crash-safety
  contract as ``Warehouse.rewrite``).

The reference's closest surface is index creation on staging keys
(``lib/etl/loading.rb:276-282``) — a hint to the storage layer that
reads will seek on this column; these operators are the
immutable-parquet realization of that hint.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "shard_assignments",
    "write_training_shards",
    "write_sorted",
    "write_bucketed",
    "compact",
    "file_stats",
    "zorder_key",
    "write_zordered",
]

#: Default compaction target: 128 MiB per file (one HDFS/S3-friendly
#: block; small enough to parallelize, large enough to amortize open).
DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def write_sorted(
    df: DataFrame,
    path: str,
    *,
    sort_by: list[str],
    partition_by: list[str] | None = None,
    range_partitions: int | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write parquet with files clustered on ``sort_by``.

    ``range_partitions`` first range-partitions rows on ``sort_by`` so
    each output file owns a disjoint key range (global clustering);
    otherwise only the in-file sort is applied. Either way every file's
    row-group min/max stats are tight on ``sort_by``, so a predicate
    on those columns skips whole files at scan time.
    """
    out = df
    if range_partitions:
        out = out.repartitionByRange(range_partitions, *sort_by)
    out = out.sortWithinPartitions(*sort_by)
    writer = out.write.mode("overwrite")
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_by: str,
    buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a hash-bucketed (and optionally bucket-sorted)
    catalog table. Joins/aggregations on ``bucket_by`` between tables
    with the same bucket count read co-located data — no exchange.
    """
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = df.write.mode(mode).option("path", path).bucketBy(buckets, bucket_by)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def file_stats(path: str) -> dict:
    """Parquet-file census for a table directory (recursive):
    ``{n_files, total_bytes, min_bytes, max_bytes, avg_bytes}``.
    Driver-side listing — bounded by file count, the quantity
    compaction is about to shrink."""
    sizes = []
    for root, _dirs, files in os.walk(path):
        sizes += [
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        ]
    if not sizes:
        return {"n_files": 0, "total_bytes": 0, "min_bytes": 0,
                "max_bytes": 0, "avg_bytes": 0}
    return {
        "n_files": len(sizes),
        "total_bytes": sum(sizes),
        "min_bytes": min(sizes),
        "max_bytes": max(sizes),
        "avg_bytes": sum(sizes) // len(sizes),
    }


def compact(
    spark: SparkSession,
    path: str,
    *,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    sort_by: list[str] | None = None,
) -> dict:
    """Rewrite the parquet table at ``path`` into
    ``ceil(total_bytes / target_bytes)`` files (optionally re-sorted
    on ``sort_by`` to restore clustering), atomically swapping the
    directory so readers never observe a partial table.

    Returns ``{"before": file_stats, "after": file_stats}``. Uses
    ``repartition``/``repartitionByRange`` (a full shuffle): at scale
    run it per partition-directory, bounded by the partition's size,
    not the table's.
    """
    before = file_stats(path)
    n = max(1, math.ceil(before["total_bytes"] / target_bytes))
    df = spark.read.parquet(path)
    if sort_by:
        df = df.repartitionByRange(n, *sort_by).sortWithinPartitions(*sort_by)
    else:
        df = df.repartition(n)
    tmp = path.rstrip("/") + ".compact-" + uuid.uuid4().hex[:8]
    df.write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + ".old-" + uuid.uuid4().hex[:8]
    os.rename(path, old)
    try:
        os.rename(tmp, path)
    finally:
        shutil.rmtree(old, ignore_errors=True)
    return {"before": before, "after": file_stats(path)}


def zorder_key(df: DataFrame, cols: list[str], *, bits: int = 16):
    """Z-order (Morton) key column over ``cols``: each column is
    scaled into a ``2^bits`` grid by its global min/max, then the grid
    coordinates' bits interleave. Rows close on the curve are close in
    EVERY dimension, so sorting by this one key clusters all listed
    columns at once — where a plain sort only clusters its leading
    column.

    The min/max pass is one bounded aggregate (2*len(cols) scalars to
    the driver). Bit interleaving is a pure JVM expression chain
    (shift/or), no UDF.
    """
    from pyspark.sql import functions as F

    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(
            f"zorder_key: {bits} bits x {len(cols)} columns = "
            f"{bits * len(cols)} interleaved bits does not fit a "
            f"signed 64-bit key; lower bits to {63 // len(cols)} or "
            f"fewer columns"
        )
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).first()
    n_cells = 1 << bits
    coords = []
    for c in cols:
        if stats[f"mn_{c}"] is None or stats[f"mx_{c}"] is None:
            raise ValueError(
                f"zorder_key: column {c!r} is entirely NULL (or the "
                f"input is empty) — no min/max to scale the grid; "
                f"filter NULLs or drop the column from the key"
            )
        lo, hi = float(stats[f"mn_{c}"]), float(stats[f"mx_{c}"])
        span = (hi - lo) or 1.0
        cell = F.least(
            F.lit(n_cells - 1),
            F.floor(
                (F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * n_cells
            ).cast("long"),
        )
        # NULL coordinate -> cell 0 (sorts first). Without this,
        # least(n-1, NULL) silently returns n-1 (Spark's least SKIPS
        # nulls) and NULL rows would cluster at the key-space MAX.
        coords.append(F.when(F.col(c).isNull(), F.lit(0)).otherwise(cell))
    # interleave: output bit (i*len(cols)+j) takes bit i of coord j
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, cell in enumerate(coords):
            bit = F.shiftright(cell, i).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, i * len(coords) + j).cast("long")
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` range-partitioned + sorted by its Z-order key over
    ``cols``: every output file then holds a tight min/max box in ALL
    listed dimensions, so parquet row-group stats skip files for
    predicates on ANY of them (a sorted write only skips on its
    leading column). The curve key is dropped before writing — layout
    only, schema unchanged."""
    from pyspark.sql import functions as F

    keyed = df.withColumn("__zkey", zorder_key(df, cols, bits=bits))
    # Range boundaries come from a per-partition reservoir sample; at
    # the default (100/partition) the boundary noise makes file spans
    # drift run-to-run (measured ±0.03 span-fraction at sf0.01, enough
    # to wobble the layout gate). 1000 samples of one LONG key per
    # partition is negligible driver traffic and makes the boundaries
    # (hence the physical layout) reproducible.
    sess = df.sparkSession
    conf_key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    prev = sess.conf.get(conf_key, None)
    sess.conf.set(conf_key, "1000")
    try:
        (
            keyed.repartitionByRange(num_files, F.col("__zkey"))
            .sortWithinPartitions("__zkey")
            .drop("__zkey")
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if prev is None:
            sess.conf.unset(conf_key)
        else:
            sess.conf.set(conf_key, prev)


def shard_assignments(
    df: DataFrame,
    tokens_col: str,
    shard_tokens: int,
    *,
    id_col: str = "doc_id",
    shard_col: str = "shard",
) -> DataFrame:
    """Assign every row to a token-balanced training shard: rows are
    walked in deterministic ``(md5(id), id)`` order and a row belongs
    to the shard its RUNNING token total starts in —
    ``shard = (running - n_tokens) DIV shard_tokens`` — so shard
    boundaries never split a document and every shard except the last
    holds at least ``shard_tokens`` minus one document of tokens
    (overshoot <= one document, the packing-literature greedy bound).

    The running total is :func:`ids.global_running_sum`'s two-pass
    range-partitioned prefix sum — NO single-task global window, the
    trap a naive ``sum() OVER (ORDER BY ...)`` plans. Rows with NULL
    token counts are dropped (undefined budget cost, same contract as
    ``token_budget_cap``).
    """
    from datacamp_etl_spark.operators.curation import _order_hash
    from datacamp_etl_spark.operators.ids import global_running_sum

    if shard_tokens < 1:
        raise ValueError("shard_tokens must be >= 1")
    base = (
        df.where(F.col(tokens_col).isNotNull())
        .withColumn("__h", _order_hash(id_col))
    )
    run = global_running_sum(
        base, ["__h", id_col], tokens_col, sum_col="__run"
    )
    return run.withColumn(
        shard_col,
        F.expr(
            f"(__run - CAST({tokens_col} AS BIGINT)) "
            f"DIV CAST({shard_tokens} AS BIGINT)"
        ).cast("long"),
    ).drop("__h", "__run")


def write_training_shards(
    df: DataFrame,
    path: str,
    tokens_col: str,
    shard_tokens: int,
    *,
    id_col: str = "doc_id",
) -> DataFrame:
    """Write the corpus as token-balanced training shards + manifest —
    the terminal step of a curation pipeline: trainers consume
    fixed-budget files round-robin, and the manifest is the unit of
    resume/verification.

    Layout: ``<path>/shards`` partitioned by ``shard`` (each shard a
    partition directory a data loader can claim atomically) and
    ``<path>/manifest`` with one row per shard: ``(shard, n_docs,
    n_tokens, min_id, max_id, ids_md5)`` — the md5 of the sorted id
    list pins shard membership, so a re-run (or a re-shard after a
    corpus change) is verifiable shard-by-shard without reading data
    files. Returns the manifest DataFrame.

    The manifest's id digest is an aggregation (sorted array_join +
    md5) per shard — bounded by shard membership, never collected.
    """
    assigned = shard_assignments(
        df, tokens_col, shard_tokens, id_col=id_col
    )
    assigned.write.mode("overwrite").partitionBy("shard").parquet(
        f"{path}/shards"
    )
    manifest = (
        assigned.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col(tokens_col).cast("long")).alias("n_tokens"),
            F.min(id_col).alias("min_id"),
            F.max(id_col).alias("max_id"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.col(id_col))),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("ids_md5"),
        )
        .orderBy("shard")
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/manifest"
    )
    return manifest
