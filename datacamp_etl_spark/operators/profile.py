"""Data profiling [EXT]: single-pass column statistics and fixed-bin
histograms.

The reference's monitoring stops at job status rows
(``etl_manager.rb`` status view); a warehouse also needs DATA-level
monitoring. Both operators are one aggregation pass:

- :func:`column_profile` computes count / nulls / exact distinct /
  min / max for every listed column in ONE ``agg`` (map-side partial
  merge; the multi-distinct expand is Catalyst's standard rewrite),
  then unpivots the single result row into a (column, stats) table.
- :func:`numeric_histogram` buckets with pure arithmetic (no
  ``width_bucket`` dependency, replayable in any engine) and
  aggregates counts per bin — the profile never materializes rows.

Bounded outputs (columns x 1, bins x 1) make these safe to collect
and cheap to snapshot per batch for drift monitoring at any fact
size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["column_profile", "numeric_histogram"]


def column_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One row per column: ``column, n, n_null, n_distinct, min_val,
    max_val`` (min/max as DOUBLE — numeric columns only)."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nn"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(F.col(c).cast("double")).alias(f"{c}__mn"),
            F.max(F.col(c).cast("double")).alias(f"{c}__mx"),
        ]
    row = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__n, {c}__nn, {c}__nd, {c}__mn, {c}__mx" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column, n, n_null, n_distinct, min_val, max_val)"
        )
    )


def histogram_bucket(
    col: Column, lo: float, hi: float, bins: int
) -> Column:
    """Bin index in [0, bins): plain arithmetic, clamped at both ends
    so out-of-range values land in the edge bins (monitoring wants
    them visible, not dropped)."""
    raw = F.floor((col.cast("double") - F.lit(lo)) / F.lit(hi - lo) * bins)
    return F.greatest(F.lit(0), F.least(F.lit(bins - 1), raw)).cast("int")


def numeric_histogram(
    df: DataFrame, col: str, *, lo: float, hi: float, bins: int = 20
) -> DataFrame:
    """Fixed-range histogram ``(bucket, lo_edge, hi_edge, n)``. A
    fixed range keeps bucket edges stable across batches (comparable
    snapshots for drift detection); pass data-derived bounds
    explicitly when exploring."""
    width = (hi - lo) / bins
    b = histogram_bucket(F.col(col), lo, hi, bins)
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * F.lit(width)).alias("lo_edge"),
            (F.lit(lo) + (F.col("bucket") + 1) * F.lit(width)).alias("hi_edge"),
            "n",
        )
    )
