"""Streaming sinks [EXT]: exactly-once-effect upsert + watermark
late-data drop semantics — the delivery contracts a 100 TB streaming
ingest stands on."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from datacamp_etl_spark.streaming.sinks import (
    committed_batches,
    idempotent_upsert_sink,
    upsert_batch,
)

SCHEMA = "user_id long, value double, ts timestamp"


def _write_file(spark, path, rows, mtime):
    df = spark.createDataFrame(
        rows, "user_id long, value double, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    tmp = path + ".stage"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    os.rename(os.path.join(tmp, part), path)
    os.utime(path, (mtime, mtime))  # file source orders by mod time


def test_upsert_sink_two_batches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): second batch's keys
    replace the first's, unmatched keys pass through."""
    src = str(tmp_path / "src")
    _write_file(
        spark, os.path.join(src, "f1.parquet"),
        [(1, 1.0, "2024-01-01 10:00:00"), (2, 1.0, "2024-01-01 10:01:00"),
         (3, 1.0, "2024-01-01 10:02:00")],
        1_700_000_000,
    )
    _write_file(
        spark, os.path.join(src, "f2.parquet"),
        [(2, 2.0, "2024-01-01 11:00:00"), (3, 2.0, "2024-01-01 11:01:00"),
         (4, 2.0, "2024-01-01 11:02:00")],
        1_700_000_100,
    )
    table = str(tmp_path / "table")
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(
            idempotent_upsert_sink(table, ["user_id"])
        )
        .option("checkpointLocation", tempfile.mkdtemp(prefix="sink_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["user_id"]: r["value"] for r in spark.read.parquet(table).collect()
    }
    assert got == {1: 1.0, 2: 2.0, 3: 2.0, 4: 2.0}
    assert committed_batches(table + ".ledger") == {0, 1}


def test_upsert_replay_semantics(spark, tmp_path):
    """The two failure windows of at-least-once delivery:
    (a) crash AFTER marker -> replay is skipped by the ledger;
    (b) crash BETWEEN swap and marker -> re-merge is idempotent."""
    table = str(tmp_path / "t")
    ledger = table + ".ledger"
    fn = idempotent_upsert_sink(table, ["user_id"], ledger_path=ledger)

    b0 = spark.createDataFrame(
        [(1, 1.0, None), (2, 1.0, None)], SCHEMA
    )
    fn(b0, 0)
    snap = sorted(map(tuple, spark.read.parquet(table).collect()))

    # (a) marker exists -> replay must not touch the table (even a
    # poisoned replay frame is ignored)
    poisoned = spark.createDataFrame([(9, 9.9, None)], SCHEMA)
    fn(poisoned, 0)
    assert sorted(map(tuple, spark.read.parquet(table).collect())) == snap

    # (b) simulate crash between swap and marker: apply batch 1, strip
    # its marker, replay the SAME frame -> byte-identical table
    b1 = spark.createDataFrame([(2, 2.0, None), (3, 2.0, None)], SCHEMA)
    fn(b1, 1)
    after_first = sorted(map(tuple, spark.read.parquet(table).collect()))
    os.remove(os.path.join(ledger, "1"))
    fn(b1, 1)
    assert sorted(map(tuple, spark.read.parquet(table).collect())) == after_first
    assert committed_batches(ledger) == {0, 1}


def test_upsert_batch_creates_then_merges(spark, tmp_path):
    table = str(tmp_path / "fresh")
    a = spark.createDataFrame([(1, 1.0, None)], SCHEMA)
    upsert_batch(a, table, ["user_id"])
    b = spark.createDataFrame([(1, 5.0, None), (2, 1.0, None)], SCHEMA)
    upsert_batch(b, table, ["user_id"])
    got = {r["user_id"]: r["value"] for r in spark.read.parquet(table).collect()}
    assert got == {1: 5.0, 2: 1.0}


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed count with a 1 h watermark over three
    micro-batches. Spark only GUARANTEES dropping a late row once its
    window's state was evicted in an earlier batch (same-batch late
    rows may still be admitted while state lingers), so the late
    arrival is staged two batches after the watermark passed:
    batch 0 opens the 01:00 window and advances the watermark to
    11:00; batch 1 evicts + emits that window (count 1); batch 2's
    01:20 event must be dropped — the emitted count stays 1 and the
    window is never re-emitted."""
    src = str(tmp_path / "wm_src")
    _write_file(
        spark, os.path.join(src, "f1.parquet"),
        [(1, 1.0, "2024-01-01 01:10:00"),      # window [01:00, 02:00)
         (2, 1.0, "2024-01-01 12:00:00")],      # advances watermark to 11:00
        1_700_000_000,
    )
    _write_file(
        spark, os.path.join(src, "f2.parquet"),
        [(5, 1.0, "2024-01-01 13:00:00")],      # batch 1: evict + emit 01:00
        1_700_000_100,
    )
    _write_file(
        spark, os.path.join(src, "f3.parquet"),
        [(3, 1.0, "2024-01-01 01:20:00"),       # LATE: state already evicted
         (4, 1.0, "2024-01-01 14:00:00")],      # fresh
        1_700_000_200,
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_drop_test")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="wm_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = [
        (str(r["w_start"]), r["n"])
        for r in spark.table("wm_drop_test").collect()
    ]
    # the late event (id 3) did NOT bump the 01:00 window, and the
    # finalized window was emitted exactly once
    assert emitted.count(("2024-01-01 01:00:00", 1)) == 1, emitted
    assert ("2024-01-01 01:00:00", 2) not in emitted, emitted
