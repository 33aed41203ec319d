"""Time-series rollup operators [EXT] — hypertable-style bucketing.

The TimescaleDB/InfluxDB idiom the events table wants: fixed-width
time buckets with the gaps FILLED (a dashboard or downstream model
needs a row for every bucket, not just the observed ones), plus
last-observation-carried-forward for sampled gauges.

Scale shape: the per-bucket aggregation is one map-side-combined
groupBy; the gap spine is ``|groups| x |buckets|`` rows generated
from a 2-value bounds aggregate — bounded by the time range, not the
data; the fill join shuffles only the spine against the (already
aggregated, bucket-sized) rollup. LOCF is one window pass per group
ordered by bucket — state O(1) per group.

The reference aggregates event streams per day via its scheduled jobs
(``lib/etl/etl_manager.rb:100-136`` daily cadence); gapfill makes
those rollups dense, which its SQL consumers assume implicitly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["time_bucket", "gapfill_counts", "locf"]


def time_bucket(ts: Column | str, width: str = "1 hour") -> Column:
    """Truncate a timestamp to its containing fixed-width bucket start
    (``window`` semantics without the struct)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.window(c, width)["start"]


def gapfill_counts(
    df: DataFrame,
    ts_col: str,
    group_cols: list[str],
    *,
    width: str = "1 hour",
    agg: dict[str, Column] | None = None,
) -> DataFrame:
    """Dense per-bucket rollup: one row for EVERY ``width`` bucket
    between the data's min and max bucket, for every group — missing
    buckets appear with ``n = 0`` (and NULL for custom aggs).

    ``agg`` maps extra output columns to aggregate expressions
    (evaluated per (group, bucket)); ``n`` (the row count) is always
    present and zero-filled.
    """
    bucket = time_bucket(ts_col, width)
    aggs = [F.count("*").alias("n")] + [
        expr.alias(name) for name, expr in (agg or {}).items()
    ]
    rolled = df.groupBy(*group_cols, bucket.alias("bucket")).agg(*aggs)

    bounds = df.agg(
        F.min(bucket).alias("__lo"), F.max(bucket).alias("__hi")
    )
    step = F.expr(f"INTERVAL {width}")
    spine = (
        df.select(*group_cols).distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            *group_cols,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), step)
            ).alias("bucket"),
        )
    )
    out = spine.join(rolled, [*group_cols, "bucket"], "left")
    return out.withColumn("n", F.coalesce("n", F.lit(0)))


def locf(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    fill_cols: list[str],
) -> DataFrame:
    """Last-observation-carried-forward: NULLs in ``fill_cols`` take
    the most recent non-NULL value within the group (ordered by
    ``order_col``). Leading NULLs stay NULL. One window pass; the
    carried values ride the same struct so a partially-NULL later row
    is filled from column-wise latest observations (the standard LOCF
    gauge semantic)."""
    w = (
        W.partitionBy(*group_cols)
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = df
    for c in fill_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out
