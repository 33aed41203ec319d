"""Parallelism floor for CPU-bound kernels [EXT].

Spark sizes scan partitions by BYTES (``spark.sql.files.
maxPartitionBytes``), which is right for IO-bound scans and wrong for
CPU-bound text/vector kernels: a 5 MB single-row-group parquet file of
5 000 documents is one partition, so a shingle/regex/embedding kernel
runs on ONE core no matter how many the cluster has. (Observed on this
repo's bench: contamination_check 59 s -> 12 s at sf0.1 just from
spreading the scan.)

:func:`ensure_parallelism` repartitions ONLY when the input has fewer
partitions than the floor — at 100 TB inputs arrive in thousands of
splits and this is a no-op (no added shuffle); on small/badly-packed
inputs it buys full-cluster parallelism for one narrow shuffle of the
rows it was about to grind through single-threaded anyway. Operators
with expensive per-row kernels call it on their document input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "ensure_parallelism",
    "evaluate_once",
    "release_engine_caches",
    "scoped_cache",
]

#: Handles of every DataFrame the engine cached via scoped_cache, so
#: hosts can bound cache lifetime (Spark's CacheManager never evicts
#: by itself; without a release hook, repeated operator invocations
#: accumulate executor storage for the session's lifetime).
_ENGINE_CACHES: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """``df.cache()`` with a REGISTERED lifecycle: the handle is
    recorded so :func:`release_engine_caches` can unpersist every
    engine-held intermediate after the host's action completes.
    Operators cache multi-consumer intermediates (posting lists,
    shingle indexes) through this, never via bare ``.cache()``."""
    _ENGINE_CACHES.append(df)
    return df.cache()


def release_engine_caches() -> int:
    """Unpersist every :func:`scoped_cache`-registered DataFrame
    (non-blocking), sweep any other still-persisted RDD blocks, and
    return how many handles were released. Call between queries in
    long-lived hosts (bench loop, driver gate, notebook)."""
    n = len(_ENGINE_CACHES)
    for df in _ENGINE_CACHES:
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    _ENGINE_CACHES.clear()
    # ``localCheckpoint()`` (graph CC rounds, contiguous-id offsets,
    # BPE merge pins) persists RDD blocks that no scoped_cache handle
    # tracks. In a long-lived host they accumulate across queries:
    # storage fills, the unified memory manager squeezes execution
    # memory, and late sort/join-heavy queries start spilling (~10x
    # observed on the 89-query bench JVM). Sweep the JVM's persistent
    # -RDD registry too — between host actions no in-flight plan may
    # depend on a previous query's materialized state, the same
    # contract the scoped-cache release already relies on.
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is not None:
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            n += jmap.size()
            for jrdd in jmap.values():
                jrdd.unpersist(False)
            # Broadcast payloads and shuffle files are reclaimed by
            # Spark's ContextCleaner only after a GC turns their weak
            # references over — and a driver that is busy running
            # queries back-to-back may not GC for the whole session,
            # so hundreds of dead broadcasts/shuffles stay pinned.
            # Drop the py4j references first, then nudge the JVM so
            # the cleaner's reference queue actually drains.
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()
    except Exception:  # session stopped / JVM gone — nothing to free
        pass
    return n


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Return ``df`` unchanged if it already has at least
    ``min_partitions`` (default: the cluster's default parallelism)
    partitions; otherwise repartition up to that floor."""
    sc = df.sparkSession.sparkContext
    floor = min_partitions or sc.defaultParallelism
    # partition count of the physical plan; no job is triggered
    if df.rdd.getNumPartitions() >= floor:
        return df
    return df.repartition(floor)


def evaluate_once(df: DataFrame, cols: dict) -> DataFrame:
    """Attach each expression in ``cols`` as a column that is computed
    exactly ONCE per row, even when referenced many times downstream.

    Catalyst's CollapseProject inlines a projected expression into
    every downstream use — for heavy interpreted expressions (regex
    normalization, higher-order array lambdas) that multiplies the
    per-row cost by the reference count (measured 6x on the
    repetition-profile kernel at sf0.1). A single-element
    ``explode(array(struct(...)))`` inserts a Generate node, which is
    a projection barrier: the struct is evaluated once and downstream
    projections only extract fields from it.
    """
    from pyspark.sql import functions as F  # local: keep module surface lean

    packed = F.explode(
        F.array(F.struct(*[c.alias(n) for n, c in cols.items()]))
    ).alias("__once")
    out = df.select("*", packed)
    return out.select(
        "*", *[F.col(f"__once.{n}").alias(n) for n in cols]
    ).drop("__once")
