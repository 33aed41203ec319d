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

__all__ = [
    "column_profile",
    "numeric_histogram",
    "numeric_correlations",
    "psi_drift",
    "ks_drift",
    "mad_outliers",
    "robust_scale",
    "quantile_normalize",
]


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


def numeric_correlations(
    df: DataFrame,
    cols: Sequence[str],
    *,
    scale: int = 100,
    decimals: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlation matrix over numeric columns — the
    profiling step that finds redundant measures and leakage-shaped
    relationships before a feature set ships: one row per unordered
    column pair ``(col_a, col_b, n_rows, r)``.

    Exactness: values are fixed-pointed (``floor(v·scale + 0.5)``,
    pairwise-complete rows only) and all six sums per pair (n, Σx,
    Σy, Σxy, Σx², Σy²) accumulate in DECIMAL(38,0); r is assembled
    with the same fixed IEEE order as
    :func:`~datacamp_etl_spark.operators.timeseries.cross_correlation`
    and rounded once — bit-replayable. Pairs with < 2 complete rows
    or zero variance on either side carry NULL.

    Scale shape: ONE aggregation pass over the facts computes every
    pair's six sums map-side-combined (6·C(k,2) accumulators in a
    single 1-row result — schema-bounded, never a per-pair rescan);
    the per-pair rows are then bounded selects off that cached 1-row
    frame. No joins, no windows, no second fact pass.
    """
    if len(cols) < 2:
        raise ValueError("numeric_correlations needs at least 2 columns")
    from functools import reduce

    from datacamp_etl_spark.operators.spread import scoped_cache

    # Column-prune BEFORE the wide aggregation (the 6·C(k,2)
    # DECIMAL(38,0) accumulators are the cost; no repartition — the
    # agg is map-side partial, so an extra exchange only adds work)
    df = df.select(*cols)

    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    pairs = [
        (a, b, f"{i}_{j}")
        for i, a in enumerate(cols)
        for j, b in enumerate(cols)
        if i < j
    ]
    aggs = []
    for a, b, p in pairs:
        both = F.col(a).isNotNull() & F.col(b).isNotNull()
        xa = F.when(both, F.floor(F.col(a) * scale + F.lit(0.5)).cast("long"))
        xb = F.when(both, F.floor(F.col(b) * scale + F.lit(0.5)).cast("long"))
        aggs += [
            F.sum(F.when(both, 1).otherwise(0)).alias(f"n_{p}"),
            F.sum(d(xa)).alias(f"sx_{p}"),
            F.sum(d(xb)).alias(f"sy_{p}"),
            F.sum(d(xa) * d(xb)).alias(f"sxy_{p}"),
            F.sum(d(xa) * d(xa)).alias(f"sxx_{p}"),
            F.sum(d(xb) * d(xb)).alias(f"syy_{p}"),
        ]
    row = scoped_cache(df.agg(*aggs))
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    outs = []
    for a, b, p in pairs:
        vx = dd(f"n_{p}") * dd(f"sxx_{p}") - dd(f"sx_{p}") * dd(f"sx_{p}")
        vy = dd(f"n_{p}") * dd(f"syy_{p}") - dd(f"sy_{p}") * dd(f"sy_{p}")
        num = dd(f"n_{p}") * dd(f"sxy_{p}") - dd(f"sx_{p}") * dd(f"sy_{p}")
        outs.append(
            row.select(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.col(f"n_{p}").cast("long").alias("n_rows"),
                F.round(
                    F.when(
                        (F.col(f"n_{p}") >= 2) & (vx > 0) & (vy > 0),
                        num / F.sqrt(vx) / F.sqrt(vy),
                    ),
                    decimals,
                ).alias("r"),
            )
        )
    return reduce(lambda x, y: x.unionByName(y), outs)


def psi_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    *,
    lo: float,
    hi: float,
    bins: int = 10,
    group_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Population Stability Index between two snapshots of a numeric
    column — the standard drift monitor a training-data pipeline runs
    between ingestion batches before trusting a refreshed source:
    ``PSI = sum_i (p_i - q_i) * ln(p_i / q_i)`` over ``bins``
    fixed-range buckets (industry reading: < 0.1 stable, 0.1–0.25
    moderate shift, > 0.25 major shift — investigate).

    Proportions are Laplace-smoothed with pseudo-count 1 per bin
    (``p_i = (a_i + 1) / (n_a + bins)``): empty bins stay finite with
    no epsilon magic, the statistic is total, and the whole
    computation is INTEGER bucket counts plus one closed-form double
    pass — engine-portable and oracle-replayable. NULLs are dropped;
    out-of-range values clamp into the edge bins (same
    :func:`histogram_bucket` contract as :func:`numeric_histogram` —
    monitoring wants outliers visible, not silently dropped).

    Scale posture: each side is ONE aggregated count shuffle
    (map-side combinable) down to at most ``groups x bins`` rows; the
    bin scaffold (every group x bucket, so both-empty bins contribute
    their smoothed term) and the final per-group reduce run on that
    bounded table, never on fact rows. Returns
    ``(group_col?, n_a, n_b, psi)``.
    """
    if bins < 2:
        raise ValueError("bins must be >= 2")
    gcols = [group_col] if group_col else []
    b = histogram_bucket(F.col(col), lo, hi, bins)

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.where(F.col(col).isNotNull())
            .groupBy(*gcols, b.alias("__bucket"))
            .agg(F.count("*").alias(name))
        )

    ca, cb = counts(df_a, "__a"), counts(df_b, "__b")
    if gcols:
        groups = (
            df_a.select(*gcols).union(df_b.select(*gcols)).distinct()
        )
    else:
        groups = df_a.sparkSession.range(1).select()
    scaffold = groups.select(
        *gcols,
        F.explode(F.sequence(F.lit(0), F.lit(bins - 1))).alias("__bucket"),
    )
    filled = (
        scaffold.join(ca, [*gcols, "__bucket"], "left")
        .join(cb, [*gcols, "__bucket"], "left")
        .select(
            *gcols,
            "__bucket",
            F.coalesce("__a", F.lit(0)).alias("__a"),
            F.coalesce("__b", F.lit(0)).alias("__b"),
        )
    )
    w_tot = (
        filled.groupBy(*gcols)
        .agg(F.sum("__a").alias("__ta"), F.sum("__b").alias("__tb"))
    )
    p = (F.col("__a") + 1) / (F.col("__ta") + bins)
    q = (F.col("__b") + 1) / (F.col("__tb") + bins)
    return (
        filled.join(w_tot, gcols) if gcols
        else filled.crossJoin(F.broadcast(w_tot))
    ).groupBy(*gcols).agg(
        F.max("__ta").cast("long").alias("n_a"),
        F.max("__tb").cast("long").alias("n_b"),
        F.round(F.sum((p - q) * F.log(p / q)), decimals).alias("psi"),
    )


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    *,
    group_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic between two
    snapshots of a numeric column — the non-parametric complement to
    :func:`psi_drift`: no binning choice, sensitive to ANY shape
    difference, ``D = sup_v |F_a(v) - F_b(v)|`` over the empirical
    CDFs (rule of thumb: reject "same distribution" at alpha=0.05
    when ``D > 1.358 * sqrt((n_a+n_b)/(n_a*n_b))``).

    Exactness contract: the supremum is tracked as the INTEGER
    numerator ``max |c_a*n_b - c_b*n_a|`` over per-distinct-value
    cumulative counts, divided once at the end — a single exact
    rational, so the identical SQL oracle hash-matches (no float
    accumulation). NULLs are dropped (no order position).

    Scale shape: one map-side-combined count aggregate per
    ``(group, value)`` — the fact tables are never sorted, only the
    bounded distinct-value table is — then ONE cumulative window per
    group over that aggregated table (partitioned by group; the
    plan-audit no-partitionless-window gate is why ``group_col=None``
    uses a constant partition key over the ALREADY-AGGREGATED
    distinct-value table, bounded by value cardinality, not rows).
    Returns ``(group_col?, n_a, n_b, ks_d)``.
    """
    from pyspark.sql import Window as W

    gcols = [group_col] if group_col else []

    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.where(F.col(col).isNotNull())
            .groupBy(*gcols, F.col(col).alias("__v"))
            .agg(F.count("*").alias(name))
        )

    merged = (
        counts(df_a, "__ca")
        .join(counts(df_b, "__cb"), [*gcols, "__v"], "full")
        .select(
            *gcols,
            "__v",
            F.coalesce("__ca", F.lit(0)).alias("__ca"),
            F.coalesce("__cb", F.lit(0)).alias("__cb"),
        )
    )
    part = gcols if gcols else [F.lit(0)]
    wcum = (
        W.partitionBy(*part)
        .orderBy("__v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wtot = W.partitionBy(*part)
    cum = merged.select(
        *gcols,
        F.sum("__ca").over(wcum).alias("__fa"),
        F.sum("__cb").over(wcum).alias("__fb"),
    ).select(
        *gcols,
        "__fa",
        "__fb",
        F.max("__fa").over(wtot).alias("__na"),
        F.max("__fb").over(wtot).alias("__nb"),
    )
    # a group present in only one snapshot has no defined statistic:
    # emit NULL explicitly — ANSI mode (Spark 4 default, and the
    # driver's vanilla session) turns a bare x/0 into a runtime
    # DIVIDE_BY_ZERO instead of SQL NULL
    na, nb = F.max("__fa"), F.max("__fb")
    return cum.groupBy(*gcols).agg(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.when(
            (na > 0) & (nb > 0),
            F.round(
                F.max(F.abs(F.col("__fa") * F.col("__nb")
                            - F.col("__fb") * F.col("__na")))
                / (na * nb),
                decimals,
            ),
        ).alias("ks_d"),
    )


def _group_median_mad(
    df: DataFrame, value_col: str, group_col: str, id_col: str
):
    """Shared robust-statistics core: per-group exact median and MAD,
    UNROUNDED (display rounding belongs to :func:`mad_outliers`'
    report; :func:`robust_scale` divides by these, where rounding a
    small-scale MAD to 6 decimals would zero it out).

    Returns ``(d, med, mad)``: the scoped_cache'd ranked-deviation
    frame (group, __x, __n, __dev, __med, __dn) and the two bounded
    per-group frames (group, __med) / (group, __mad). Rows with NULL
    measurements or a NULL group key are excluded up front — a NULL
    measurement has no deviation (and engines disagree on NULL sort
    placement), and a NULL key names no group.
    """
    from pyspark.sql import Window as W

    from datacamp_etl_spark.operators.spread import scoped_cache

    x = F.col(value_col).cast("double")
    wv = W.partitionBy(group_col).orderBy(value_col, id_col)
    wc = W.partitionBy(group_col)
    df = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    )
    r = df.select(group_col, value_col, id_col).select(
        group_col,
        x.alias("__x"),
        F.col(id_col).alias("__id"),
        F.row_number().over(wv).alias("__rn"),
        F.count("*").over(wc).alias("__n"),
    )
    lo = F.floor((F.col("__n") + 1) / 2).cast("long")
    hi = F.floor((F.col("__n") + 2) / 2).cast("long")
    med = (
        r.where((F.col("__rn") == lo) | (F.col("__rn") == hi))
        .groupBy(group_col)
        .agg(F.avg("__x").alias("__med"))
    )
    dev = r.join(F.broadcast(med), group_col).select(
        group_col,
        "__x",
        "__id",
        "__n",
        F.abs(F.col("__x") - F.col("__med")).alias("__dev"),
        "__med",
    )
    wd = W.partitionBy(group_col).orderBy("__dev", "__id")
    d = scoped_cache(
        dev.select(
            group_col,
            "__x",
            "__n",
            "__dev",
            "__med",
            F.row_number().over(wd).alias("__dn"),
        )
    )
    mad = (
        d.where((F.col("__dn") == lo) | (F.col("__dn") == hi))
        .groupBy(group_col)
        .agg(F.avg("__dev").alias("__mad"))
    )
    return d, med, mad


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    id_col: str,
    z: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier profile via the median/MAD rule
    (Iglewicz & Hoaglin's modified z-score): a row is an outlier when
    ``|x - median| > z * 1.4826 * MAD`` — unlike mean/stddev fences,
    the estimator itself is immune to the outliers it hunts (50%
    breakdown point), which is what a data-quality monitor needs.

    Returns one row per group: ``(group, n, median_val, mad,
    n_outliers)``, medians exact (middle-of-two interpolation, ties
    broken by ``id_col`` so both engines rank identically). Rows with
    a NULL measurement or a NULL group key are excluded (a NULL key
    names no group). Note MAD = 0 whenever >= 50% of a group's values
    EQUAL the median — not only for constant groups — in which case
    every non-median value is an outlier by the fence.

    Scale shape: two partitioned-window passes (rank within group ->
    median; rank of |x - median| -> MAD) + one conditional count — all
    shuffles keyed by the group, never a global sort. The ranked
    deviation table feeds both the MAD extraction and the final count,
    so it is scoped_cache'd: without it Catalyst re-derives the whole
    fact lineage for each consumer (3 source scans instead of 2). The
    margin compare is pure IEEE double arithmetic in a fixed order, so
    the counts replay exactly in any engine.
    """
    d, med, mad = _group_median_mad(df, value_col, group_col, id_col)
    fence = F.lit(z) * F.lit(1.4826) * F.col("__mad")
    return (
        d.join(F.broadcast(mad), group_col)
        .groupBy(group_col)
        .agg(
            F.max("__n").alias("n"),
            F.round(F.max("__med"), 6).alias("median_val"),
            F.round(F.max("__mad"), 6).alias("mad"),
            F.sum((F.col("__dev") > fence).cast("long")).alias("n_outliers"),
        )
    )


def robust_scale(
    df: DataFrame,
    value_col: str,
    group_col: str,
    *,
    id_col: str,
    out_col: str = "robust_z",
) -> DataFrame:
    """Per-group robust standardization: append
    ``out_col = (x - median) / (1.4826 * MAD)`` — the outlier-immune
    analog of z-scoring (mean/std move with the outliers they are
    supposed to expose; median/MAD have a 50% breakdown point). The
    feature-conditioning counterpart of :func:`mad_outliers`, built on
    the same shared statistics core: the bounded per-group (median,
    MAD) frame broadcast back onto the rows.

    Rows with a NULL measurement or a NULL group key score NULL (they
    are excluded from the statistics — a NULL key names no group); a
    zero-MAD group also scores NULL rather than ±inf. Note MAD = 0
    whenever >= 50% of a group's values equal the median — not only
    for constant groups — so pair this with :func:`mad_outliers`'
    n_outliers when such groups matter.

    The statistics are the UNROUNDED internals (mad_outliers' report
    rounds to 6 decimals for display; dividing by a rounded MAD would
    zero out small-scale features entirely). Only the final score is
    rounded.

    Scale shape: the shared two group-keyed window passes produce a
    |groups|-row stats table; the scaling itself is a broadcast join +
    narrow projection over the fact — no extra shuffle.
    """
    _, med, mad = _group_median_mad(df, value_col, group_col, id_col)
    stats = (
        med.join(mad, group_col)
        .select(
            F.col(group_col).alias("__rs_g"),
            F.col("__med").alias("__rs_med"),
            F.col("__mad").alias("__rs_mad"),
        )
    )
    x = F.col(value_col).cast("double")
    z = F.when(
        F.col("__rs_mad") > 0,
        F.round(
            (x - F.col("__rs_med")) / (F.lit(1.4826) * F.col("__rs_mad")),
            6,
        ),
    )
    return (
        df.join(
            F.broadcast(stats), df[group_col] == F.col("__rs_g"), "left"
        )
        .withColumn(out_col, z)
        .drop("__rs_g", "__rs_med", "__rs_mad")
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    id_cols: Sequence[str],
    *,
    group_col: str | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Percent-rank normalization — map a numeric column to its
    empirical quantile ``(min_rank - 1) / (n - 1)`` in [0, 1] (per
    ``group_col`` when given): the rank-based feature scaling that is
    immune to outliers and distribution shape where z-scores are not
    (the uniform-score half of classic quantile normalization; ties
    share their min-rank score, the SQL ``percent_rank`` convention).

    Exactness: the score is an exact integer rational (cumulative
    count below / (n-1)) divided once and rounded — engine-portable.
    NULL values pass through with a NULL score.

    Scale shape: ranks come from the AGGREGATED value table — one
    map-side-combined count per (group, value), one cumulative window
    over that bounded table (distinct values, not rows), and one
    equi-join back to the facts. NEVER a per-group sort of fact rows
    (the trap a naive ``percent_rank() OVER (ORDER BY v)`` builds at
    100 TB). Groups with a single row score NULL (0/0 — no spread to
    place the value in). Returns ``(*id_cols, group_col?, value_col,
    q_score)``.
    """
    from pyspark.sql import Window as W

    gcols = [group_col] if group_col else []
    # internal names are disambiguated up front — the fact frame and
    # the scored value table share the group/value column names, and
    # Spark's ambiguous-self-join analyzer (rightly) rejects a join
    # that reuses them
    gint = [f"__g{i}" for i in range(len(gcols))]
    vals = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(
            *[F.col(c).alias(a) for c, a in zip(gcols, gint)],
            F.col(value_col).alias("__v"),
        )
        .agg(F.count("*").alias("__c"))
    )
    part = gint if gint else [F.lit(0)]
    wcum = (
        W.partitionBy(*part)
        .orderBy("__v")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wg = W.partitionBy(*part)
    scored = vals.select(
        *gint,
        "__v",
        (F.sum("__c").over(wcum) - F.col("__c")).alias("__below"),
        (F.sum("__c").over(wg) - 1).alias("__nm1"),
    ).select(
        *gint,
        "__v",
        F.when(
            F.col("__nm1") > 0,
            F.round(F.col("__below") / F.col("__nm1"), decimals),
        ).alias("q_score"),
    )
    cond = [
        df[c].eqNullSafe(scored[a]) for c, a in zip(gcols, gint)
    ] + [df[value_col] == scored["__v"]]
    return df.join(scored, cond, "left").select(
        *[df[c] for c in id_cols],
        *[df[c] for c in gcols],
        df[value_col],
        "q_score",
    )


def score_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    id_col: str,
    *,
    bins: int = 10,
) -> DataFrame:
    """Calibration/reliability table for a scorer against 0/1 labels:
    rows ranked into ``bins`` exact equal-count score bins (ANSI
    ntile semantics over ``(score, id)`` — via the range-exchange
    :func:`ids.exact_ntile`, never a single-task global sort), each
    bin reporting its size, positive count, exact positive rate in
    ppm and its score range. A calibrated scorer's pos_ppm climbs
    monotonically with the bin; the table is what ECE/reliability
    diagrams are read off, kept exact-integer so the replay is
    hash-stable.

    The quality-scorer loop this closes: rule battery -> weak labels
    -> logistic margins (classify.logistic_train) -> THIS table says
    whether the margins can be thresholded where the rules matter.
    """
    from datacamp_etl_spark.operators.ids import exact_ntile

    # carry_cols (r13 cont.): the whole row is 3 narrow columns, so
    # the label rides through the one range exchange and the binned
    # output is served from the ranking checkpoint — the scorer
    # lineage feeding ``df`` evaluates ONCE instead of once for the
    # ranking pass and once for the output projection (a scoped_cache
    # of the scored relation was tried instead and REVERTED: it keeps
    # both evaluations and adds a materialization; this removes one).
    binned = exact_ntile(
        df.select(
            F.col(id_col),
            F.col(score_col).alias("__score"),
            F.col(label_col).cast("long").alias("__y"),
        ),
        ["__score", id_col],
        bins,
        bucket_col="bin",
        carry_cols=["__y"],
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("__y").cast("long").alias("n_pos"),
            F.expr("(1000000 * sum(__y)) DIV count(*)")
            .cast("long")
            .alias("pos_ppm"),
            F.min("__score").alias("min_score"),
            F.max("__score").alias("max_score"),
        )
        .select(
            F.col("bin").cast("long").alias("bin"),
            "n",
            "n_pos",
            "pos_ppm",
            "min_score",
            "max_score",
        )
    )


def gini_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_col: str,
    *,
    decimals: int = 6,
    scale: int = 1,
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative measure via the
    exact rank formula over ascending values,

        G = 2·Σ(i·x_i) / (n·Σx) − (n+1)/n

    (Sen 1973 form) — the concentration audit for curation: a source
    whose token mass has G→1 is one giant document wearing a
    thousand doc_ids (cap it), G→0 is evenly spread. Complements
    :func:`~datacamp_etl_spark.operators.skew.key_skew_report`
    (top-k share) with the full-distribution statistic.

    **Values must be integral** (counts, bytes, integer cents): the
    accumulator casts to DECIMAL(38,0), which rounds a fractional
    measure half-up to whole units before the rank formula. For a
    fractional measure pass ``scale`` (e.g. 100 for cent precision)
    to pre-scale to fixed-point first — G is scale-invariant, so any
    ``scale`` preserving the needed precision yields the same
    coefficient (same convention as :func:`rfm_segments`). With the
    default ``scale=1`` integral inputs pass through bit-exact.

    Exactness: ranks come from one group-partitioned window ordered
    by (value, ``order_col``) — the tiebreak makes ranks
    deterministic and the formula is tie-invariant in value terms;
    Σx and Σi·x accumulate in DECIMAL(38,0); G is fixed-order double
    rounded once. Groups with Σx = 0 carry NULL. Returns
    ``(group_col, n_rows, gini)``.
    """
    from pyspark.sql import Window as W

    if scale < 1:
        raise ValueError("scale must be a positive integer")
    w = W.partitionBy(group_col).orderBy(F.col(value_col), F.col(order_col))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    x = (
        F.floor(F.col(value_col) * scale + F.lit(0.5))
        if scale != 1
        else F.col(value_col)
    )
    ranked = df.select(
        group_col,
        d(x).alias("__x"),
        F.row_number().over(w).alias("__i"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.count("*").alias("__n"),
        F.sum("__x").alias("__s"),
        F.sum(d(F.col("__i")) * F.col("__x")).alias("__t"),
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    g = (
        (F.lit(2.0) * dd("__t")) / (dd("__n") * dd("__s"))
        - (dd("__n") + F.lit(1.0)) / dd("__n")
    )
    return agg.select(
        group_col,
        F.col("__n").cast("long").alias("n_rows"),
        F.round(F.when(F.col("__s") > 0, g), decimals).alias("gini"),
    )


def rfm_segments(
    orders: DataFrame,
    *,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    ntiles: int = 5,
    scale: int = 100,
) -> DataFrame:
    """RFM segmentation (Hughes 1994): every customer scored 1..n on
    Recency (last order date), Frequency (order count) and Monetary
    (lifetime spend), each as an exact equal-count quantile — the
    classic lifecycle segmentation (r=f=m=n is the champion corner,
    r=1 the churned). Ascending semantics on all three axes: higher
    score = more recent / more frequent / higher spend.

    Exactness & scale: spend accumulates in integer cents; each axis
    is binned by :func:`~datacamp_etl_spark.operators.ids.exact_ntile`
    (range-exchange + parallel per-partition windows — ANSI-ntile
    values WITHOUT the single-task global sort ``ntile().over()``
    would plan), with the customer key as deterministic tiebreak.
    Returns ``(cust_col, r, f, m, segment)`` with segment = r*100 +
    f*10 + m.
    """
    from datacamp_etl_spark.operators.ids import exact_ntile_multi

    # Measured (r13): NOT cached on purpose — pinning the 3-col
    # aggregate cost more in cache materialization than the pruned
    # re-runs saved (3.7 s -> 5.2 s standalone at sf0.1 when cached).
    # Instead (r13 cont.) all three axes rank in ONE
    # exact_ntile_multi pass: the per-customer aggregate (a full
    # fact-table groupBy) evaluates once for the ranking + once for
    # the output projection, versus once per axis + output with
    # sequential exact_ntile calls; range exchanges 3 -> 1, driver
    # jobs 9 -> 3. The recency axis ranks through the exact
    # tz-independent microsecond epoch offset (strictly monotone +
    # injective on the timestamp domain, so bucket values are
    # identical to ranking the timestamp itself).
    per = orders.groupBy(cust_col).agg(
        F.max(date_col).alias("__last"),
        F.count("*").alias("__f"),
        F.sum(
            F.floor(F.col(amount_col) * scale + F.lit(0.5)).cast("long")
        ).alias("__m"),
    )
    # dtype-dispatched exact epoch offset: each branch is strictly
    # monotone + injective on its own domain (NTZ/date never touch the
    # session tz; LTZ maps the instant itself), so the ranked order
    # and tie structure equal the raw column's.
    last_dt = dict(per.dtypes)["__last"]
    if last_dt == "timestamp_ntz":
        last_us = F.expr(
            "timestampdiff(MICROSECOND, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00', __last)"
        )
    elif last_dt == "date":
        last_us = F.unix_date(F.col("__last")).cast("long")
    else:  # timestamp (ltz)
        last_us = F.unix_micros(F.col("__last"))
    binned = exact_ntile_multi(
        per,
        [(last_us, "r"), (F.col("__f"), "f"), (F.col("__m"), "m")],
        ntiles,
        tiebreak_col=cust_col,
    )
    return binned.select(
        cust_col,
        F.col("r").cast("int").alias("r"),
        F.col("f").cast("int").alias("f"),
        F.col("m").cast("int").alias("m"),
        (F.col("r") * 100 + F.col("f") * 10 + F.col("m"))
        .cast("int")
        .alias("segment"),
    )


def two_proportion_ztest(
    df: DataFrame,
    group_col: str,
    success_col: str,
    *,
    group_a,
    group_b,
    critical_z: float = 1.96,
    decimals: int = 6,
) -> DataFrame:
    """Two-proportion pooled z-test (the standard A/B conversion
    test): for units labeled ``group_a`` / ``group_b`` with a 0/1
    ``success_col``,

        z = (p_a − p_b) / sqrt( p̂(1−p̂) (1/n_a + 1/n_b) ),
        p̂ = (x_a + x_b) / (n_a + n_b)

    with ``significant`` = |z| > ``critical_z`` (1.96 = two-sided
    α=0.05). Joins the drift family (PSI/KS/chi²) as the EXPERIMENT
    verdict: not "did the distribution move" but "is B's conversion
    rate different from A's beyond sampling noise".

    Exactness: counts are exact integers from one map-side-combined
    groupBy; every derived quantity is fixed-order IEEE double
    rounded once — oracle-replayable. Degenerate pools (p̂ = 0 or 1,
    or an empty arm) carry NULL z. Returns one row
    ``(n_a, x_a, n_b, x_b, p_a, p_b, z, significant)``.
    """
    from pyspark.sql import functions as F  # noqa: F811

    s = F.col(success_col).cast("long")
    agg = df.where(
        F.col(group_col).isin([group_a, group_b])
    ).agg(
        F.sum(F.when(F.col(group_col) == group_a, 1).otherwise(0)).alias(
            "n_a"
        ),
        F.sum(F.when(F.col(group_col) == group_a, s).otherwise(0)).alias(
            "x_a"
        ),
        F.sum(F.when(F.col(group_col) == group_b, 1).otherwise(0)).alias(
            "n_b"
        ),
        F.sum(F.when(F.col(group_col) == group_b, s).otherwise(0)).alias(
            "x_b"
        ),
    )
    dd = lambda name: F.col(name).cast("double")  # noqa: E731
    pa = dd("x_a") / dd("n_a")
    pb = dd("x_b") / dd("n_b")
    pool = (dd("x_a") + dd("x_b")) / (dd("n_a") + dd("n_b"))
    se = F.sqrt(
        (pool * (F.lit(1.0) - pool))
        * (F.lit(1.0) / dd("n_a") + F.lit(1.0) / dd("n_b"))
    )
    z = F.round(
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0) & (se > 0),
            (pa - pb) / se,
        ),
        decimals,
    )
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("x_a").cast("long").alias("x_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("x_b").cast("long").alias("x_b"),
        F.round(F.when(F.col("n_a") > 0, pa), decimals).alias("p_a"),
        F.round(F.when(F.col("n_b") > 0, pb), decimals).alias("p_b"),
        z.alias("z"),
        F.when(z.isNotNull(), F.abs(z) > F.lit(float(critical_z))).alias(
            "significant"
        ),
    )
