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
