"""Incremental loading with a metadata high-watermark (reference F2/K3).

The reference tracked incremental progress two ways:

- a designed-but-commented predicate ``date_created > <last_run>``
  (``loading.rb:142-145``, ``job_manager.rb:112``)
- the ``etl_loaded_date`` staging-column stamp (``loading.rb:198-201``)

At scale the in-table flag is an anti-pattern (rewrites the whole
staging table every load); the first-class mechanism here is a
**high-watermark stored in the defaults KV** (domain-scoped, C1-C6),
with the column stamp available as a compat mode in
:func:`datacamp_etl_spark.operators.loading.set_loaded_flag`.

With date-partitioned staging layouts the watermark predicate becomes
partition pruning at the parquet scan — verified by
``plans.assert_partition_filter``.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    from datacamp_etl_spark.metadata.defaults import ETLDefaults

__all__ = [
    "IncrementalLoader",
    "windowed_event_counts",
    "chained_window_peaks",
    "stream_static_enriched_counts",
    "stream_stream_conversion_join",
    "sessionize",
]

_WM_KEY = "incremental_watermark"
_FMT = "%Y-%m-%d %H:%M:%S.%f"


class IncrementalLoader:
    """Watermark-driven incremental reads over an append-only staging
    table.

    Usage::

        inc = IncrementalLoader(job.defaults, watermark_column="ts")
        fresh = inc.filter_new(staging_df)     # rows past the watermark
        ... process ...
        inc.advance(fresh)                     # commit max(ts) as new WM

    ``advance`` computes the max watermark of the processed batch with
    a single narrow agg (no driver materialization of data rows).
    """

    def __init__(
        self,
        defaults: "ETLDefaults",
        *,
        watermark_column: str = "date_created",
        key: str = _WM_KEY,
    ):
        self.defaults = defaults
        self.watermark_column = watermark_column
        self.key = key

    def current_watermark(self) -> datetime | None:
        raw = self.defaults.get(self.key)
        if raw is None:
            return None
        return datetime.strptime(raw, _FMT)

    def filter_new(self, staging: DataFrame) -> DataFrame:
        """Reference F2: ``col > watermark``; full scan on first run."""
        wm = self.current_watermark()
        if wm is None:
            return staging
        return staging.where(F.col(self.watermark_column) > F.lit(wm))

    def advance(self, processed: DataFrame) -> datetime | None:
        """Commit the batch's max watermark (inclusive semantics: the
        next ``filter_new`` uses strict ``>``, so reprocessing is
        impossible for monotonic sources; late data below the watermark
        is the caller's policy decision, as in Structured Streaming)."""
        row = processed.agg(
            F.max(self.watermark_column).alias("wm")
        ).collect()[0]
        wm = row["wm"]
        if wm is None:
            return self.current_watermark()
        if isinstance(wm, datetime):
            value = wm.strftime(_FMT)
        else:
            value = str(wm)
        self.defaults[self.key] = value
        return wm

    def reset(self) -> None:
        self.defaults.delete(self.key)


def streaming_events(
    spark,
    path: str,
    schema: str = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    ),
):
    """``readStream`` over a parquet events directory — the idiomatic
    upgrade of the incremental pattern (Trigger.AvailableNow drains
    exactly the unprocessed files; checkpoint = the watermark)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window aggregation (works on both batch and
    streaming DataFrames; in streaming mode late data beyond
    ``watermark`` is dropped and state is evicted — bounded memory at
    any scale)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def stream_static_enriched_counts(
    events: DataFrame,
    dim: DataFrame,
    *,
    stream_key: str = "user_id",
    dim_key: str = "c_custkey",
    dim_col: str = "c_mktsegment",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-static join + windowed aggregation: enrich a stream with
    a batch dimension table, then count per (window, dim attribute).

    The static side is re-planned per micro-batch (Structured
    Streaming's stream-static contract), so dim updates between
    batches are picked up; the join itself is stateless — no state
    store growth from the dim side. At 100 TB the dim join follows
    normal batch join rules (broadcast if small, shuffle otherwise);
    only the windowed agg keeps state, bounded by the watermark.
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    enriched = df.join(
        dim.select(F.col(dim_key).alias(stream_key), dim_col),
        on=stream_key,
        how="inner",
    )
    return (
        enriched.groupBy(F.window("ts", window).alias("w"), dim_col)
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            dim_col,
            "n_events",
            "sum_value",
        )
    )


def stream_stream_conversion_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_type: str = "view",
    right_type: str = "purchase",
    horizon: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: for every ``left_type`` event, the
    ``right_type`` events by the same key within ``[ts, ts + horizon]``.

    Both sides carry watermarks, and the join condition bounds the
    right timestamp relative to the left one, so the engine can size
    the join state: a buffered left row is evictable once the right
    watermark passes ``left.ts + horizon``, and vice versa. Without the
    time bound the state store would grow forever — the bound is what
    makes this viable on an unbounded 100 TB/day stream.

    Works identically on batch inputs (no watermark applied), where
    Catalyst plans it as an ordinary range-bounded equi-join.
    """
    l = left.where(F.col("event_type") == left_type).select(  # noqa: E741
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    )
    r = right.where(F.col("event_type") == right_type).select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    )
    if l.isStreaming:
        l = l.withWatermark("l_ts", watermark)  # noqa: E741
    if r.isStreaming:
        r = r.withWatermark("r_ts", watermark)
    joined = l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {horizon}")),
        "inner",
    )
    return joined.select(
        F.col("l_key").alias(key),
        "l_event_id",
        "r_event_id",
        (F.unix_micros(F.col("r_ts")) - F.unix_micros(F.col("l_ts"))).alias(
            "lag_us"
        ),
    )


def sessionize(
    events: DataFrame,
    *,
    gap_minutes: int = 30,
    tiebreak_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sessionization: assign session ids per user from inactivity gaps
    (batch form: lag + cumulative sum — two window passes over the
    user partition; streaming form would use ``session_window``).

    Gap arithmetic is integer microseconds (``unix_micros``) — exact
    and engine-portable, no float epoch. ``tiebreak_cols`` extend the
    within-user ordering so ties on ``ts`` are deterministic.

    Returns events plus ``session_id`` (``<user_id>-<n>``)."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", *tiebreak_cols)
    micros = F.unix_micros(F.col("ts"))
    gap = micros - F.lag(micros).over(w)
    new_session = (gap.isNull() | (gap > gap_minutes * 60 * 1_000_000)).cast("int")
    session_n = F.sum(new_session).over(
        w.rowsBetween(W.unboundedPreceding, 0)
    )
    return events.withColumn(
        "session_id",
        F.concat_ws("-", F.col("user_id"), session_n),
    )


def chained_window_peaks(
    events: DataFrame,
    *,
    inner_window: str = "1 hour",
    outer_window: str = "1 day",
    watermark: str = "2 hours",
) -> DataFrame:
    """CHAINED stateful aggregation (two windowed aggs in ONE
    streaming query — the multi-stateful-operator capability added in
    Spark 3.4): hourly event counts per type, re-aggregated into the
    daily peak/total per type.

    The first aggregation keys state by (hour window, type); the
    second consumes the first's *windowed output* via
    ``F.window(time_col=window)`` chaining, keying state by (day
    window, type). Watermark propagates through both operators, so
    both state stores evict — bounded memory on an unbounded stream.
    Works identically on batch input (no watermark; Catalyst plans two
    ordinary aggregations).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    hourly = df.groupBy(
        F.window("ts", inner_window).alias("w"), "event_type"
    ).agg(F.count("*").alias("n_events"))
    daily = (
        hourly.groupBy(
            F.window(F.col("w"), outer_window).alias("d"), "event_type"
        )
        .agg(
            F.max("n_events").alias("peak_hourly_events"),
            F.sum("n_events").alias("day_events"),
        )
        .select(
            F.col("d.start").alias("day_start"),
            "event_type",
            "peak_hourly_events",
            "day_events",
        )
    )
    return daily
