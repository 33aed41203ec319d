"""Corpus curation operators: per-source caps and percentile trims [EXT].

North-star training-data operators (SURVEY §2.14): bounding the
contribution of any single source/domain, and trimming outlier
documents by a quality signal's percentile. Both are deterministic
(hash-ordered, id-tiebroken) so reruns and incremental appends make
the same decisions.

Scale posture (100 TB):
- :func:`cap_per_group` shuffles once on the group key; within a
  group it keeps the N smallest hash values. Implemented as a window
  row_number — rank-k per key, no global sort. A pathologically hot
  group is one window partition; cap it upstream with
  :func:`~datacamp_etl_spark.operators.skew.salted_join`-style
  two-phase selection if a single domain exceeds a task's memory
  (at N in the thousands this never happens — the window only
  buffers until it has emitted N rows per key... conservatively, the
  sort buffer spills).
- :func:`percentile_trim` (exact) rides
  :func:`~datacamp_etl_spark.operators.ids.exact_ntile` — a
  range-exchange plus per-partition windows, never the single-task
  partitionless WindowExec the naive ``ntile().over(orderBy)``
  plans. :func:`percentile_trim_approx` stays the cheapest path when
  approximate boundaries suffice: two approxQuantile numbers
  broadcast into a narrow scan-pushable filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cap_per_group",
    "percentile_trim",
    "percentile_trim_approx",
    "percentile_trim_grouped",
    "winsorize",
    "length_bucket_batches",
    "token_budget_cap",
]


def _order_hash(id_col: str):
    """Deterministic per-row order key: first 8 md5 hex digits of the
    id as an integer (cross-engine reproducible), id as tiebreak."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")


def cap_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    n: int,
) -> DataFrame:
    """Keep at most ``n`` rows per ``group_col`` value, chosen by
    deterministic hash order (not arrival order — append-stable and
    unbiased). The survivor set for a group never changes when OTHER
    groups grow."""
    w = Window.partitionBy(group_col).orderBy(
        _order_hash(id_col), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def percentile_trim(
    df: DataFrame,
    value_col: str,
    id_col: str,
    buckets: int = 20,
    keep_lo: int = 2,
    keep_hi: int | None = None,
) -> DataFrame:
    """EXACT percentile trim: rank all rows by (value, id) into
    ``buckets`` equal-count ntiles and keep buckets
    ``keep_lo..keep_hi`` inclusive (defaults drop the bottom and top
    1/buckets of rows). Deterministic: ties broken by id.

    Plans a range-exchange + parallel per-partition windows (via
    :func:`~datacamp_etl_spark.operators.ids.exact_ntile`), not a
    partitionless WindowExec — the exact trim survives 100 TB; reach
    for :func:`percentile_trim_approx` only when approximate
    boundaries are acceptable and the extra exchange isn't.
    """
    from datacamp_etl_spark.operators.ids import exact_ntile

    keep_hi = buckets - 1 if keep_hi is None else keep_hi
    return (
        exact_ntile(df, [value_col, id_col], buckets, bucket_col="__q")
        .where(F.col("__q").between(keep_lo, keep_hi))
        .drop("__q")
    )


def percentile_trim_approx(
    df: DataFrame,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    relative_error: float = 0.001,
) -> DataFrame:
    """Approximate percentile trim — the 100 TB path: one
    approxQuantile pass (Greenwald-Khanna, no global sort) yields two
    threshold numbers on the driver; the trim itself is then a narrow
    scan-pushable filter."""
    qlo, qhi = df.approxQuantile(value_col, [lo, hi], relative_error)
    return df.where(F.col(value_col).between(qlo, qhi))


def winsorize(
    df: DataFrame,
    value_col: str,
    id_col: str,
    *,
    lo: float = 0.05,
    hi: float = 0.95,
    out_col: str | None = None,
) -> DataFrame:
    """EXACT winsorization: clip ``value_col`` to the order-statistic
    values at quantiles ``lo``/``hi`` (value at 1-based sorted position
    ``max(1, ceil(p * n))``, ordered by ``(value, id)``) — the
    trim-free outlier treatment: rows are kept, tails are clamped.

    Scale shape: the thresholds come from
    :func:`~datacamp_etl_spark.operators.ids.exact_quantile_values`
    (one range-exchange + a 2-value driver collect, no single-task
    sort); the clip itself is then a narrow scan-pushable projection
    with two literal bounds.
    """
    from datacamp_etl_spark.operators.ids import exact_quantile_values

    vlo, vhi = exact_quantile_values(
        df, value_col, [value_col, id_col], [lo, hi]
    )
    out_col = out_col or f"{value_col}_w"
    return df.withColumn(
        out_col,
        F.least(F.greatest(F.col(value_col), F.lit(vlo)), F.lit(vhi)),
    )


def percentile_trim_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    buckets: int = 20,
    keep_lo: int = 2,
    keep_hi: int | None = None,
) -> DataFrame:
    """EXACT percentile trim WITHIN each group: rank rows by
    ``(value, id)`` inside every ``group_col`` partition into
    ``buckets`` ntiles and keep ``keep_lo..keep_hi`` — per-source
    outlier policy (each source sheds ITS OWN tails, so a verbose
    source doesn't eat a terse one's budget).

    The window is partitioned by the group key, so this is the plain
    scale-safe shape — one shuffle on ``group_col``, parallel windows,
    no order-statistics machinery needed.
    """
    keep_hi = buckets - 1 if keep_hi is None else keep_hi
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col), F.col(id_col)
    )
    return (
        df.withColumn("__q", F.ntile(buckets).over(w))
        .where(F.col("__q").between(keep_lo, keep_hi))
        .drop("__q")
    )


def length_bucket_batches(
    df: DataFrame,
    n_tokens_col: str,
    batch_size: int,
    *,
    id_col: str = "doc_id",
    edges: list[int] | None = None,
) -> DataFrame:
    """Length-bucketed batch assembly: assign every document to a
    sequence-length band, then number fixed-size batches within each
    band in deterministic (md5-hash, id) order — the classic
    bucketing-by-length trick that keeps padding waste bounded by the
    band width instead of the global max length, while the hash order
    preserves the i.i.d.-like shuffle training wants.

    Adds ``band`` (the inclusive lower edge of the row's length band)
    and ``batch_id`` (0-based within the band). ``edges`` are integer
    band lower bounds (default power-of-two bands 0/64/128/256/512/
    1024) — integer comparisons only, so the assignment replays
    exactly in any engine. Rows BELOW the smallest edge or with a
    NULL length have no band (the "inclusive lower edge" claim would
    be a lie for them) and are dropped — pass an explicit ``edges``
    starting at 0 to make the lowest band a catch-all.

    Scale shape: ONE shuffle keyed by the band (a window partitioned
    by band, ordered by the hash key); batches never cross a band, so
    batch numbering is embarrassingly parallel across bands. A hot
    band is one window partition — split it by salting the band key
    into (band, hash % s) sub-streams if a profile shows it; batch
    ids stay dense within each sub-stream.
    """
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    lows = sorted(edges) if edges else [0, 64, 128, 256, 512, 1024]
    n = F.col(n_tokens_col)
    band = F.when(n >= lows[0], F.lit(lows[0]))  # NULL below the floor
    for lo in lows[1:]:
        band = F.when(n >= lo, F.lit(lo)).otherwise(band)
    w = Window.partitionBy("band").orderBy(_order_hash(id_col), F.col(id_col))
    return (
        df.withColumn("band", band.cast("long"))
        .where(F.col("band").isNotNull())
        .withColumn(
            "batch_id",
            ((F.row_number().over(w) - 1) / batch_size).cast("long"),
        )
    )


def token_budget_cap(
    df: DataFrame,
    n_tokens_col: str,
    budget_tokens: int,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-source token-budget selection: walk each group's documents
    in deterministic (md5-hash, id) order and keep rows while the
    group's RUNNING token total stays within ``budget_tokens`` — the
    "give every source at most B tokens of the mix" curation
    primitive (:func:`cap_per_group` caps document COUNTS; training
    budgets are set in tokens).

    A document is kept iff the running total INCLUDING it is within
    budget, so the kept set is a prefix of the hash order and
    append-stable: new corpus arrivals sort after or between existing
    docs and can only be rejected, never evict a previously kept doc
    whose prefix sum was already within budget... strictly: a new doc
    hashing into the prefix shifts later sums, so re-runs on a grown
    corpus stay deterministic but not monotone — pin the selection by
    snapshot when exact reproducibility across appends matters.

    One group-keyed window (running sum + integer arithmetic only);
    no global sort, no driver state. Rows with a NULL token count are
    dropped upfront — they have no defined budget cost, and keeping
    them would make the keep/drop decision depend on where the NULL
    lands in the hash order (sum() skips NULLs mid-stream but a
    leading NULL poisons the running total).
    """
    if budget_tokens < 0:
        raise ValueError("budget_tokens must be >= 0")
    df = df.where(F.col(n_tokens_col).isNotNull())
    w = (
        Window.partitionBy(group_col)
        .orderBy(_order_hash(id_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = F.sum(F.col(n_tokens_col).cast("long")).over(w)
    return (
        df.withColumn("__cum_tokens", running)
        .where(F.col("__cum_tokens") <= budget_tokens)
        .withColumnRenamed("__cum_tokens", "cum_tokens")
    )
