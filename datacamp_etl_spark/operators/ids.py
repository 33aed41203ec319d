"""Distributed ID assignment [EXT].

Assigning contiguous global ids with ``row_number() OVER (ORDER BY
...)`` funnels every row through ONE task — the canonical
accidentally-single-node plan. The scalable shape is two-pass:

1. range-partition by the ordering key, count rows per partition
   (bounded driver collect: one long per partition),
2. broadcast the cumulative offsets and add them to the per-partition
   ``row_number`` (each window covers one partition — parallel).

Same contract as the global sort, shuffle-equivalent cost, no
single-task stage. The reference's serial-id analog is the warehouse
sequence (``loading.rb`` staging ``id serial``); this is the
distributed replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_contiguous_ids", "training_order"]


def assign_contiguous_ids(
    df: DataFrame,
    order_cols: list[str],
    *,
    id_col: str = "row_id",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` with contiguous ids ``start..start+n-1`` in the
    total order of ``order_cols`` (which must be a unique key — ties
    would make the order, and thus the ids, nondeterministic)."""
    parts = df.repartitionByRange(
        *( [num_partitions] if num_partitions else [] ), *order_cols
    ).withColumn("__pid", F.spark_partition_id())
    # Pass 1: per-partition counts -> cumulative offsets. Bounded by
    # the partition count, never by the data.
    counts = parts.groupBy("__pid").count().orderBy("__pid").collect()
    offsets, acc = {}, start
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["count"]
    off_df = F.broadcast(
        parts.sparkSession.createDataFrame(
            [(p, o) for p, o in offsets.items()], "__pid int, __off long"
        )
    )
    # Pass 2: per-partition row_number (parallel windows) + offset.
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    return (
        parts.join(off_df, "__pid")
        .withColumn(
            id_col, (F.row_number().over(w) - 1 + F.col("__off")).cast("long")
        )
        .drop("__pid", "__off")
    )


def training_order(df: DataFrame, key_cols: list[str], *, seed: int = 0) -> Column:
    """Deterministic pseudo-random training order: md5 over the key
    (+ seed) — reproducible across engines and runs, re-shuffled by
    changing ``seed``. Use as ``orderBy(training_order(df, [...]))``
    or as the range-partition key of a shuffled write."""
    return F.md5(F.concat_ws("\x1f", F.lit(str(seed)), *key_cols))
