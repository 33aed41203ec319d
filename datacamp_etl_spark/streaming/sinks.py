"""Streaming sinks [EXT] — exactly-once-effect delivery to immutable
parquet.

Structured Streaming guarantees at-least-once delivery to a
``foreachBatch`` sink: after a crash the last unacknowledged batch is
REPLAYED with the same ``batch_id``. Exactly-once *effect* therefore
needs the sink to be idempotent per ``(batch_id, data)``. Two layers
provide it here:

1. a **batch ledger**: one marker file per committed batch id,
   created atomically after the table swap. A replayed batch whose
   marker exists is skipped outright.
2. an **idempotent keyed upsert**: even if the process dies between
   the table swap and the marker creation, replaying the merge with
   the same keys produces a byte-identical table (anti-join on keys +
   union is a set operation, and the write is an atomic directory
   swap — readers never observe a partial table).

This is the streaming realization of the reference's loaded-flag
protocol (K3, ``lib/etl/loading.rb:198-222``): its "mark rows loaded,
re-process only unmarked" is the same commit-marker idea, applied per
batch instead of per row.

Scale: the merge is one anti-join shuffle on the key columns, bounded
by table + batch size. At 100 TB you'd partition the table and merge
only touched partitions; the contract (ledger + atomic swap) is
unchanged.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame

__all__ = ["upsert_batch", "idempotent_upsert_sink", "committed_batches"]


def committed_batches(ledger_path: str) -> set[int]:
    """Batch ids already committed to the ledger."""
    if not os.path.isdir(ledger_path):
        return set()
    return {int(f) for f in os.listdir(ledger_path) if f.isdigit()}


def upsert_batch(
    batch_df: DataFrame, table_path: str, key_cols: list[str]
) -> None:
    """Keyed upsert of one (already in-batch-deduplicated) batch into
    the parquet table at ``table_path``: existing rows matching a
    batch key are replaced, everything else passes through. Atomic
    directory swap — crash-safe, replay-safe."""
    spark = batch_df.sparkSession
    if os.path.isdir(table_path):
        existing = spark.read.parquet(table_path)
        merged = existing.join(
            batch_df.select(*key_cols), key_cols, "left_anti"
        ).unionByName(batch_df)
    else:
        merged = batch_df
    tmp = table_path.rstrip("/") + ".batch-" + uuid.uuid4().hex[:8]
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.isdir(table_path):
        old = table_path.rstrip("/") + ".old-" + uuid.uuid4().hex[:8]
        os.rename(table_path, old)
        try:
            os.rename(tmp, table_path)
        finally:
            shutil.rmtree(old, ignore_errors=True)
    else:
        os.rename(tmp, table_path)


def idempotent_upsert_sink(
    table_path: str,
    key_cols: list[str],
    *,
    ledger_path: str | None = None,
):
    """A ``foreachBatch`` function delivering exactly-once-effect keyed
    upserts into ``table_path``.

    Usage::

        q = (df.writeStream
               .foreachBatch(idempotent_upsert_sink(path, ["user_id"]))
               .option("checkpointLocation", ckpt)
               .trigger(availableNow=True)
               .start())

    The caller is responsible for in-batch uniqueness of ``key_cols``
    (dedup upstream, e.g. a windowed latest-per-key); the sink then
    guarantees replays cannot double-apply a batch.
    """
    ledger = ledger_path or table_path.rstrip("/") + ".ledger"

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id in committed_batches(ledger):
            return  # replayed batch: already fully applied
        upsert_batch(batch_df, table_path, key_cols)
        os.makedirs(ledger, exist_ok=True)
        # atomic marker create: rename is atomic on POSIX
        marker_tmp = os.path.join(ledger, f".{batch_id}.{uuid.uuid4().hex[:8]}")
        with open(marker_tmp, "w") as fh:
            fh.write("committed")
        os.rename(marker_tmp, os.path.join(ledger, str(batch_id)))

    return fn
