"""Sketch aggregates [EXT] — cardinality and frequency estimation at
100 TB, with *deterministic* algorithms.

Spark's built-in sketches (``approx_count_distinct`` = HLL++,
``percentile_approx`` = KLL-ish) are the right defaults on a cluster,
and :func:`approx_distinct` / :func:`approx_quantiles` expose them.
But their estimates are engine-specific, so no SQL oracle can confirm
them cell-for-cell. The two sketches below are chosen to be
**cross-engine deterministic** — every intermediate value is an exact
integer derived from md5, so the identical algorithm runs as ANSI SQL
on DuckDB and hash-matches:

- **KMV (k-minimum-values)** distinct-count sketch: keep the ``k``
  smallest distinct 32-bit hash values; the k-th minimum estimates the
  density of the hashed population: ``est = (k-1) * 2^32 / kth_min``
  (Bar-Yossef et al., "Counting distinct elements in a data stream").
  Distributed shape: one map-side-combined ``distinct`` + a global
  top-k (TakeOrdered) — the k-minima merge associatively, so this is
  exactly a 1000-executor-friendly aggregation. Memory is O(k) no
  matter the input size.

- **Count-min sketch** frequency table (Cormode & Muthukrishnan):
  ``depth`` hash rows x ``width`` cells of exact counters;
  ``est(v) = min_i counts[i][h_i(v)]`` (always >= true count).
  Build is ONE shuffle of ``depth * width`` cells (map-side combine
  collapses the depth-fold row inflation before the exchange); the
  finished sketch is tiny and broadcast-joins to any probe set.

The reference has no sketches (closest prior art: its row-digest MD5,
``lib/etl/loading.rb:254-270`` — the same hash-the-row idea, used here
as the hash family).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

__all__ = [
    "hash32",
    "kmv_distinct",
    "kmv_distinct_by",
    "kmv_set_ops",
    "cm_sketch",
    "cm_estimate_counts",
    "approx_distinct",
    "approx_quantiles",
    "quantile_sketch_contract",
]

#: Hash space size for the 8-hex-digit md5 prefix: [0, 2^32).
HASH_SPACE = 1 << 32


def hash32(col: Column | str) -> Column:
    """First 8 hex chars of ``md5(string(col))`` as a BIGINT in
    [0, 2^32) — deterministic, partition-order-free, and expressible
    identically in any SQL engine (no engine-native hash involved)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")


def kmv_distinct(df: DataFrame, col: str, *, k: int = 256) -> DataFrame:
    """KMV distinct-count sketch of ``df[col]``.

    Returns ONE row ``(n_minima, kth_min, est_distinct)``. When the
    true distinct count is below ``k`` the sketch is exact
    (``est = n_minima``); otherwise ``est = (k-1) * 2^32 div kth_min``
    — exact integer arithmetic end-to-end, so the identical SQL oracle
    hash-matches.

    Plan shape: hash projection -> partial-aggregated ``distinct`` ->
    ``TakeOrdered(k)`` -> single-row agg. Nothing driver-side grows
    with the data; the only global object is the k smallest hashes.
    """
    minima = (
        df.select(hash32(col).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    n = F.count("*")
    kth = F.max("h")
    return minima.agg(
        n.alias("n_minima"),
        kth.alias("kth_min"),
        F.when(n < k, n)
        .otherwise(F.expr(f"{(k - 1) * HASH_SPACE} div max(h)"))
        .alias("est_distinct"),
    )


def kmv_distinct_by(
    df: DataFrame, keys: list[str], col: str, *, k: int = 64
) -> DataFrame:
    """Grouped KMV: per ``keys`` group, the distinct-count estimate of
    ``col`` — ``(*keys, n_minima, kth_min, est_distinct)``.

    Shape: one shuffle for ``distinct (keys, h)``, then a per-key
    window keeps the k minima (the heavy sort is per-group and
    AQE-splittable), then a per-key agg. At 100 TB the distinct step's
    map-side combine does the real work; state per group is O(k).
    """
    w = W.partitionBy(*keys).orderBy("h")
    minima = (
        df.select(*keys, hash32(col).alias("h"))
        .distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
    )
    n = F.count("*")
    return minima.groupBy(*keys).agg(
        n.alias("n_minima"),
        F.max("h").alias("kth_min"),
        F.when(n < k, n)
        .otherwise(F.expr(f"{(k - 1) * HASH_SPACE} div max(h)"))
        .alias("est_distinct"),
    )


def _cell(i: Column | int, col: Column, width: int) -> Column:
    """Row-``i`` cell index of value ``col``: hash32('<i>:' || v) % width."""
    ic = F.lit(i) if isinstance(i, int) else i
    return (hash32(F.concat(ic.cast("string"), F.lit(":"), col.cast("string"))) % width)


def cm_sketch(
    df: DataFrame, col: str, *, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build a count-min sketch of ``df[col]`` as a counts table
    ``(i, cell, cnt)`` with ``depth`` rows x ``width`` cells.

    The explode inflates rows ``depth``-fold *before* the exchange, but
    partial aggregation collapses each task's output to at most
    ``depth * width`` cells — the shuffle moves sketch cells, not data
    rows. The result is bounded (``depth * width`` rows) regardless of
    input size: the distributable form of the classic array-of-counters.
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(1, depth + 1)])).alias("i")
    cells = df.select(rows, F.col(col).alias("__v")).select(
        "i", _cell(F.col("i"), F.col("__v"), width).alias("cell")
    )
    return cells.groupBy("i", "cell").agg(F.count("*").alias("cnt"))


def cm_estimate_counts(
    sketch: DataFrame,
    items: DataFrame,
    col: str,
    *,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Probe a :func:`cm_sketch` for each row of ``items[col]``:
    ``(col, est_count)`` where ``est = min_i counts[i][h_i(v)]``.

    The sketch is at most ``depth * width`` rows — Spark's size stats
    broadcast it, so probing any number of items is a narrow map-side
    join (no shuffle of the probe side).
    """
    rows = F.explode(F.array(*[F.lit(i) for i in range(1, depth + 1)])).alias("i")
    icells = items.select(F.col(col), rows).select(
        col, "i", _cell(F.col("i"), F.col(col), width).alias("cell")
    )
    return (
        icells.join(sketch, ["i", "cell"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )


def approx_distinct(df: DataFrame, col: str, *, rsd: float = 0.05) -> DataFrame:
    """Spark-native HLL++ (`approx_count_distinct`) — the production
    default for ad-hoc cardinality at scale. Estimate is deterministic
    per engine but not cross-engine, so tests bound relative error
    against the exact count instead of hash-matching an oracle."""
    return df.agg(F.approx_count_distinct(col, rsd).alias("approx_distinct"))


def approx_quantiles(
    df: DataFrame, col: str, probabilities: list[float], *, accuracy: int = 10_000
) -> list[float]:
    """Spark-native quantile sketch (``approxQuantile``): single pass,
    mergeable, error bounded by 1/accuracy. Returns driver-side floats
    (bounded: one per probability)."""
    return df.approxQuantile(col, probabilities, 1.0 / accuracy)


# ---------------------------------------------------------------------
# Mergeable HLL distinct-count state (DataSketches)
# ---------------------------------------------------------------------

def hll_state(
    df: DataFrame, keys: list[str], col: str, *, lg_k: int = 14
) -> DataFrame:
    """Per-key DataSketches HLL state over ``col`` — the mergeable
    distinct-count analog of incremental_agg.aggregate_state. The
    sketch is a fixed-size binary (2^lg_k registers), so maintaining
    per-key distinct counts over a 100 TB fact costs O(delta) per
    batch plus a bounded state table; exact re-counts would re-shuffle
    the full history every batch."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_k)).alias(f"hll_{col}")
    )


def hll_merge(
    state: DataFrame, delta_state: DataFrame, keys: list[str], col: str
) -> DataFrame:
    """Fold a delta's HLL state into the existing state (register-wise
    max — associative, commutative, idempotent: re-merging the SAME
    delta is harmless, unlike additive counts)."""
    sk = f"hll_{col}"
    return (
        state.unionByName(delta_state)
        .groupBy(*keys)
        .agg(F.hll_union_agg(sk).alias(sk))
    )


def hll_estimate(state: DataFrame, col: str) -> DataFrame:
    """Replace the sketch column with its distinct estimate."""
    sk = f"hll_{col}"
    return state.withColumn(
        f"n_distinct_{col}", F.hll_sketch_estimate(sk).cast("long")
    ).drop(sk)


def quantile_sketch_contract(
    df: DataFrame,
    col: str,
    probabilities: list[float],
    *,
    accuracy: int = 10_000,
) -> DataFrame:
    """Pin Spark's quantile sketch (``approx_percentile``,
    Greenwald–Khanna style) to its published contract: for each
    probability ``p`` the returned element's rank must lie within
    ``±N/accuracy`` of ``p*N``. Emits one row per probability —
    ``(prob, exact_val, within_contract)`` — where ``exact_val`` is
    the exact interpolated percentile (percentile_cont semantics,
    replayable in any engine) and ``within_contract`` verifies the
    sketch's rank error from the data itself: the returned value's
    rank interval ``[count(x < v) + 1, count(x <= v)]`` must overlap
    ``[floor((p - 1/accuracy)*N), ceil((p + 1/accuracy)*N)]`` — the
    published approxQuantile guarantee VERBATIM, floor/ceil slack
    included (a tighter un-floored bound would flag a sketch that
    legally returns the ceil-edge element). The same gate pattern as
    ``hll_incremental_distinct``: the sketch binary is not replayable,
    its CONTRACT is — a drifting sketch flips the boolean and breaks
    the oracle hash.

    An empty / all-NULL column returns zero rows (approxQuantile has
    no values to return, so there is no contract to check).

    Scale shape: the sketch pass is Spark's own single-pass mergeable
    summary (bounded state per partition, merged on the driver — the
    values collected are ``len(probabilities)`` floats, nothing more);
    the verification pass is ONE conditional aggregation over the
    column (map-side combined). Two scans total, no shuffle wider
    than a scalar agg. Caveat: the EXACT-percentile verification leg
    uses Spark's ``percentile`` aggregate, which buffers the column's
    values per partition (memory proportional to partition size,
    unlike the bounded-state sketch pass) — the gate is a fixture/
    audit tool; the production quantile path is the sketch itself.
    """
    vals = df.approxQuantile(col, list(probabilities), 1.0 / accuracy)
    if not vals:
        # empty/all-NULL column: no sketch values, no contract rows
        return df.limit(0).select(
            F.lit(0.0).alias("prob"),
            F.lit(0.0).alias("exact_val"),
            F.lit(False).alias("within_contract"),
        )
    x = F.col(col).cast("double")
    aggs = [F.count(x).alias("__n")]
    for i, (p, v) in enumerate(zip(probabilities, vals)):
        aggs += [
            # typed API, not f-string SQL: a column name needing
            # backticks would break (or silently re-parse as an
            # expression) under F.expr interpolation
            F.percentile(x, F.lit(float(p))).alias(f"__ex{i}"),
            F.sum((x <= F.lit(v)).cast("long")).alias(f"__le{i}"),
            F.sum((x < F.lit(v)).cast("long")).alias(f"__lt{i}"),
        ]
    row = df.agg(*aggs)
    eps = 1.0 / accuracy
    out = []
    for i, p in enumerate(probabilities):
        nd = F.col("__n").cast("double")
        lower = F.floor((F.lit(p) - eps) * nd)
        upper = F.ceil((F.lit(p) + eps) * nd)
        within = (F.col(f"__le{i}") >= lower) & (
            (F.col(f"__lt{i}") + 1) <= upper
        )
        out.append(
            F.struct(
                F.lit(p).alias("prob"),
                F.round(F.col(f"__ex{i}"), 6).alias("exact_val"),
                within.alias("within_contract"),
            ).alias(f"__s{i}")
        )
    return (
        row.select(F.explode(F.array(*out)).alias("s"))
        .select("s.prob", "s.exact_val", "s.within_contract")
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    col: str,
    *,
    k: int = 256,
) -> DataFrame:
    """Pairwise SET OPERATIONS on per-group KMV sketches — union /
    intersection cardinality estimates and Jaccard between every pair
    of groups, from ONE pass over the facts. Mergability is the whole
    point of a sketch at warehouse scale: per-group k-minima are
    computed once (map-side combinable, O(k) state per group) and any
    pair's union sketch is just the k smallest of the two minima sets
    — no second fact scan, ever (Beyer et al. 2007, "On synopses for
    distinct-value estimation under multiset operations").

    Estimators, all exact integer arithmetic so the identical SQL
    oracle hash-matches: ``est_union`` is the standard KMV estimate on
    the merged sketch ((k-1)*2^32 div kth, exact when the union has
    < k distinct hashes); ``matches`` = hashes present in BOTH group
    sketches that survive into the union sketch; ``jaccard`` =
    matches / |union sketch| (the minwise-resemblance estimator);
    ``est_intersection`` = matches * est_union div |union sketch|.

    Scale shape: one ``distinct (group, hash)`` shuffle over the
    facts, a per-group rank window capped at k, then EVERYTHING runs
    on the bounded |groups| x k minima table; the pair scaffold is
    |groups|^2 / 2 rows — label-domain cardinality, not data size.
    Returns ``(group_a, group_b, est_a, est_b, est_union,
    est_intersection, jaccard)`` for ``group_a < group_b``.
    """
    from datacamp_etl_spark.operators.spread import scoped_cache

    # NULL group names no set; NULL values hash to NULL, and engines
    # disagree on NULL placement in the rank window — drop both
    minima = scoped_cache(
        df.select(F.col(group_col).alias("g"), hash32(col).alias("h"))
        .where(F.col("g").isNotNull() & F.col("h").isNotNull())
        .distinct()
        .withColumn("__rn", F.row_number().over(W.partitionBy("g").orderBy("h")))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )
    n = F.count("*")
    per_group = minima.groupBy("g").agg(
        n.alias("n_min"),
        F.when(n < k, n)
        .otherwise(F.expr(f"{(k - 1) * HASH_SPACE} div max(h)"))
        .alias("est"),
    )
    pairs = (
        per_group.select(
            F.col("g").alias("ga"), F.col("est").alias("est_a")
        )
        .join(
            F.broadcast(
                per_group.select(
                    F.col("g").alias("gb"), F.col("est").alias("est_b")
                )
            ),
            F.col("ga") < F.col("gb"),
        )
    )
    # two equi-joins (never an OR-condition nested loop): each group's
    # minima rows fan out to the pairs they sit on the a-side / b-side of
    key = pairs.select("ga", "gb")
    sides = minima.join(
        F.broadcast(key), F.col("g") == F.col("ga")
    ).select("ga", "gb", "h").unionByName(
        minima.join(
            F.broadcast(key), F.col("g") == F.col("gb")
        ).select("ga", "gb", "h")
    )
    per_hash = sides.groupBy("ga", "gb", "h").agg(
        (F.count("*") == 2).alias("__both")
    )
    wu = W.partitionBy("ga", "gb").orderBy("h")
    union_sk = per_hash.withColumn(
        "__rn", F.row_number().over(wu)
    ).where(F.col("__rn") <= k)
    nu = F.count("*")
    merged = union_sk.groupBy("ga", "gb").agg(
        nu.alias("n_u"),
        F.when(nu < k, nu)
        .otherwise(F.expr(f"{(k - 1) * HASH_SPACE} div max(h)"))
        .alias("est_union"),
        F.sum(F.col("__both").cast("long")).alias("matches"),
    )
    return (
        merged.join(F.broadcast(pairs), ["ga", "gb"])
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            F.col("est_a").cast("long").alias("est_a"),
            F.col("est_b").cast("long").alias("est_b"),
            F.col("est_union").cast("long").alias("est_union"),
            F.expr("matches * est_union div n_u").cast("long")
            .alias("est_intersection"),
            F.round(F.col("matches") / F.col("n_u"), 6).alias("jaccard"),
        )
    )
