"""Stateful streaming operator [EXT]: applyInPandasWithState."""

from __future__ import annotations

import tempfile

from datacamp_etl_spark.streaming.stateful import running_user_totals


def test_running_user_totals_availablenow(spark, tmp_path):
    src = str(tmp_path / "events_src")
    spark.createDataFrame(
        [
            (1, 10.004),   # floor(1000.4 + .5) = 1000
            (1, 0.996),    # floor(99.6 + .5)  = 100
            (2, 5.0),
        ],
        "user_id long, value double",
    ).write.parquet(src)

    stream = spark.readStream.schema("user_id long, value double").parquet(src)
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName("t_stateful_totals")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    rows = {
        r["user_id"]: (r["n_events"], r["sum_cents"])
        for r in spark.table("t_stateful_totals").collect()
    }
    assert rows[1] == (2, 1100)
    assert rows[2] == (1, 500)


def test_state_carries_across_batches(spark, tmp_path):
    """Two AvailableNow drains against one checkpoint: the second run
    must resume from the state store, not recount the first file."""
    src = tmp_path / "events_src2"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    src.mkdir()

    def drain(name):
        # memory sink can't recover from a checkpoint; foreachBatch can
        got = {}

        def sink(batch_df, batch_id):
            for r in batch_df.collect():
                got[r["user_id"]] = (r["n_events"], r["sum_cents"])

        stream = spark.readStream.schema("user_id long, value double").parquet(
            str(src)
        )
        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    spark.createDataFrame([(7, 1.0)], "user_id long, value double").write.mode(
        "append"
    ).parquet(str(src))
    first = drain("t_stateful_b1")
    assert first[7] == (1, 100)

    spark.createDataFrame([(7, 2.0)], "user_id long, value double").write.mode(
        "append"
    ).parquet(str(src))
    second = drain("t_stateful_b2")
    assert second[7] == (2, 300)


def test_streaming_anomaly_matches_batch(spark, tmp_path):
    """Batch parity: the stateful ring-buffer detector over an
    AvailableNow drain of a time-ordered file must flag exactly the
    rows the batch window operator flags."""
    import pyspark.sql.functions as F

    from datacamp_etl_spark.operators.timeseries import anomaly_zscore
    from datacamp_etl_spark.streaming.stateful import (
        streaming_anomaly_zscore,
    )

    import datetime as dt

    rows = []
    eid = 0
    t0 = dt.datetime(2024, 1, 1)
    for u in (1, 2):
        for i in range(30):
            v = 5.0 + (i % 2) * 0.5
            if i in (15, 27) and u == 1:
                v = 500.0
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, v))
            eid += 1
    src = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(src)

    batch_df = spark.read.parquet(src)
    expected = {
        (r["event_id"], r["n_ref"], r["direction"])
        for r in anomaly_zscore(
            batch_df, "user_id", ["ts", "event_id"], "value"
        ).collect()
    }
    assert expected  # the fixture must actually flag something

    stream = (
        spark.readStream.schema(batch_df.schema).parquet(src)
        .where(F.col("value").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts")).alias("us"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            .alias("value_c"),
        )
    )
    q = (
        streaming_anomaly_zscore(stream)
        .writeStream.format("memory")
        .queryName("anom_parity")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["event_id"], r["n_ref"], r["direction"])
        for r in spark.table("anom_parity").collect()
    }
    assert got == expected


def test_streaming_anomaly_state_survives_batches(spark, tmp_path):
    """History built in earlier micro-batches feeds later ones: two
    sequential file drops, the spike arriving in batch 2 is judged
    against batch 1's readings."""
    import pyspark.sql.functions as F

    from datacamp_etl_spark.streaming.stateful import (
        streaming_anomaly_zscore,
    )

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    src = tmp_path / "ev2"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, value double"
    steady = [
        (i, t0 + dt.timedelta(minutes=i), 7, 5.0) for i in range(10)
    ]
    spike = [(10, t0 + dt.timedelta(minutes=10), 7, 50.0)]
    spark.createDataFrame(steady, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = (
        spark.readStream.schema(
            spark.read.parquet(str(src)).schema
        ).option("maxFilesPerTrigger", 1).parquet(str(src))
        .select(
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts")).alias("us"),
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            .alias("value_c"),
        )
    )

    out_dir = str(tmp_path / "out")

    def start():
        # parquet sink: durable, supports restart from the checkpoint
        # (memory sink does not recover)
        return (
            streaming_anomaly_zscore(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )

    start().awaitTermination()
    assert spark.read.parquet(out_dir).count() == 0  # no anomaly yet
    spark.createDataFrame(spike, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    start().awaitTermination()  # restart from checkpoint, batch 2
    out = spark.read.parquet(out_dir).collect()
    assert [(r["event_id"], r["n_ref"], r["direction"]) for r in out] == [
        (10, 10, "high")
    ]
