"""Skew-aware join [EXT] — explicit salting for hot keys.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) splits
oversized partitions at runtime and is the first line of defense. But
it only helps sort-merge joins of two shuffled sides; a *broadcast-
ineligible* join where one key holds 1% of 100 TB still funnels that
key's rows through few tasks between AQE split points. Explicit
salting spreads ONE hot build row into ``salt`` copies and scatters
the probe side uniformly — worst-case task input shrinks by the salt
factor, deterministically, on any Spark version or join strategy.

Semantics are identical to ``left.join(right, on=keys, how=...)`` for
the LEFT-PRESERVING join types (each probe row meets exactly one copy
of its matching build rows, selected by its salt). Right-preserving
joins (right/full outer) are rejected: the exploded right side would
emit every unmatched right row ``salt`` times.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "key_skew_report"]

# Join types where only the left side's match multiplicity matters —
# the salt-exploded right side never surfaces unmatched rows.
_LEFT_PRESERVING = {
    "inner",
    "cross",
    "left",
    "left_outer",
    "leftouter",
    "left_semi",
    "leftsemi",
    "semi",
    "left_anti",
    "leftanti",
    "anti",
}


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``left`` (large, possibly skewed) with ``right``
    (replicable side) on ``on``, spreading each join key over
    ``salt`` sub-keys.

    ``left`` rows get a deterministic salt from their whole row hash;
    ``right`` rows are exploded ``salt`` times. Output columns match
    the plain join (salt column dropped). ``right`` grows by the salt
    factor — keep it the smaller side.

    Only left-preserving ``how`` values are allowed (inner/left/
    semi/anti): right/full outer would duplicate unmatched right rows
    ``salt`` times.
    """
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _LEFT_PRESERVING
    }:
        raise ValueError(
            f"salted_join supports left-preserving joins only, got how={how!r}"
        )
    on = list(on)
    # pmod, not abs(...)%salt: abs(Long.MIN_VALUE) overflows negative
    # in Java two's complement, which would yield a negative salt.
    lsalt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).cast("int")
    l_salted = left.withColumn("__salt", lsalt)
    r_salted = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")),
    )
    out = l_salted.join(r_salted, on=on + ["__salt"], how=how)
    return out.drop("__salt")


def key_skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    *,
    top_k: int = 5,
) -> DataFrame:
    """Join-key skew diagnostics — the measurement that decides
    BETWEEN the mitigations this module and AQE provide: per key
    column set, the group-size distribution (exact p50/p90/p99/max
    over the aggregated count table) and the share of all rows held
    by the ``top_k`` heaviest keys. A key set whose max share is a
    few percent of the table will bottleneck a shuffle join at any
    cluster size; this report is the cheap pre-flight that catches it
    before the 100 TB run does.

    Scale shape: ONE map-side-combined count per key (the only
    fact-sized pass), then every statistic — exact percentiles
    included — computes over the bounded (n_keys)-row count table;
    the heavy-hitter share is a ``top_k``-row TakeOrdered. Returns a
    single row ``(n_rows, n_keys, p50, p90, p99, max_n, top_share)``
    with ``top_share`` an exact rational rounded to 6 decimals.
    """
    from datacamp_etl_spark.operators.spread import scoped_cache

    counts = scoped_cache(
        df.groupBy(*[F.col(c) for c in key_cols]).agg(
            F.count("*").alias("__n")
        )
    )
    top = counts.orderBy(F.desc("__n"), *key_cols).limit(top_k)
    top_sum = top.agg(F.sum("__n").alias("__top"))
    stats = counts.agg(
        F.sum("__n").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.percentile(F.col("__n"), F.lit(0.5)).alias("__p50"),
        F.percentile(F.col("__n"), F.lit(0.9)).alias("__p90"),
        F.percentile(F.col("__n"), F.lit(0.99)).alias("__p99"),
        F.max("__n").alias("max_n"),
    )
    return stats.crossJoin(F.broadcast(top_sum)).select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_keys").cast("long").alias("n_keys"),
        F.round(F.col("__p50"), 6).alias("p50"),
        F.round(F.col("__p90"), 6).alias("p90"),
        F.round(F.col("__p99"), 6).alias("p99"),
        F.col("max_n").cast("long").alias("max_n"),
        F.round(F.col("__top") / F.col("n_rows"), 6).alias("top_share"),
    )


def shard_uniformity_chi2(
    df: DataFrame,
    bucket_col,
    n_buckets: int,
    *,
    critical_value: float | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Pearson chi-square goodness-of-fit of a shard/bucket assignment
    against the uniform distribution — the pre-flight gate for any
    hash-sharding scheme (a skewed shard map becomes a straggler at
    every downstream stage). Uses the algebraic identity

        χ² = Σ (o_i − n/k)² / (n/k)  =  k·Σo_i² / n  −  n

    so the statistic is formed from two EXACT integer sums (row count
    n and Σo², with absent buckets contributing 0 automatically) in
    fixed-order double arithmetic — oracle-replayable. Pass the
    chi-square critical value for k−1 degrees of freedom (e.g. 44.985
    for k=32, α=0.05) to also emit a boolean ``uniform`` verdict.

    One map-side-combined groupBy(bucket) over the rows + one k-row
    fold. Returns one row ``(n_buckets, n_rows, chi2[, uniform])``.
    """
    counts = df.groupBy(
        F.col(bucket_col).alias("__bk")
        if isinstance(bucket_col, str)
        else bucket_col.alias("__bk")
    ).agg(F.count("*").alias("__o"))
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = counts.agg(
        F.sum("__o").alias("__n"),
        F.sum(d("__o") * d("__o")).alias("__ssq"),
    )
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    chi2 = F.round(
        F.lit(float(n_buckets)) * dd("__ssq") / dd("__n") - dd("__n"),
        decimals,
    )
    out = agg.select(
        F.lit(n_buckets).cast("int").alias("n_buckets"),
        F.col("__n").cast("long").alias("n_rows"),
        chi2.alias("chi2"),
    )
    if critical_value is not None:
        out = out.withColumn(
            "uniform", F.col("chi2") <= F.lit(float(critical_value))
        )
    return out
