"""Behavioral sequence analytics: funnels and cohort retention [EXT].

Not in the reference (its data plane is relational batch loading —
SURVEY §2.14); these are the event-analytics operators a training-data
/ product-analytics pipeline runs over an events stream at scale.

Scale posture (100 TB events):
- :func:`funnel` is k-1 equi-joins on the user key, where the left
  side shrinks monotonically (users who completed step i). After the
  first aggregation the per-user table is orders of magnitude smaller
  than raw events, and AQE broadcasts it into each subsequent probe —
  no join ever shuffles raw events more than once per step predicate.
- :func:`cohort_retention` is two user-keyed aggregations plus one
  join of (user, period) pairs against (user, cohort); both sides are
  distinct-reduced before the join so the shuffle carries at most one
  row per user-period, never raw events.

No UDFs, no driver-side iteration: everything is DataFrame joins and
map-side-combined aggregations.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "funnel",
    "funnel_counts",
    "cohort_retention",
    "event_transitions",
    "session_paths",
    "funnel_latency",
]


def funnel(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    user_col: str = "user_id",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """Per-user funnel completion times: for each user, the earliest
    timestamp of step 1, then the earliest step-2 event strictly after
    it, and so on (classic ordered-funnel semantics). ``within``
    (an INTERVAL literal body, e.g. ``'7 days'``) bounds the whole
    funnel relative to the step-1 time.

    Returns one row per user who completed step 1, with one nullable
    timestamp column per step name.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    name0, pred0 = steps[0]
    done = (
        events.where(pred0)
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(name0))
    )
    deadline = (
        (F.col(name0) + F.expr(f"INTERVAL {within}")) if within else None
    )
    prev = name0
    for name, pred in steps[1:]:
        nxt = events.where(pred).select(
            user_col, F.col(ts_col).alias("__ts")
        )
        cond = F.col("__ts") > F.col(prev)
        if deadline is not None:
            cond = cond & (F.col("__ts") <= deadline)
        done = (
            done.join(nxt, user_col, "left")
            .select(
                done["*"],
                F.when(cond, F.col("__ts")).alias("__cand"),
            )
            .groupBy(*done.columns)
            .agg(F.min("__cand").alias(name))
        )
        prev = name
    return done


def funnel_counts(
    events: DataFrame,
    steps: list[tuple[str, Column]],
    user_col: str = "user_id",
    ts_col: str = "ts",
    within: str | None = None,
) -> DataFrame:
    """Funnel summary: (step, step_index, n_users) — how many users
    reached each step in order. The per-user table never leaves the
    cluster; this is a k-column count-aggregate over it."""
    per_user = funnel(events, steps, user_col, ts_col, within)
    counts = per_user.agg(
        *[
            F.count(name).cast("long").alias(name)
            for name, _ in steps
        ]
    )
    # unpivot the single row to (step, idx, n_users) — stack is a
    # zero-shuffle projection of a 1-row input
    pairs = ", ".join(
        f"'{name}', cast({i + 1} as int), {name}"
        for i, (name, _) in enumerate(steps)
    )
    return counts.selectExpr(
        f"stack({len(steps)}, {pairs}) as (step, step_index, n_users)"
    ).select("step", "step_index", F.col("n_users").cast("long"))


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their
    first event; for each later period, how many were active.

    Output: (cohort, period_offset, n_active) where offset counts
    periods since the cohort period (0 = the cohort period itself).
    """
    per_day = {"week": 7, "day": 1}
    if period not in per_day:
        raise ValueError(f"period must be one of {sorted(per_day)}")
    cohorts = events.groupBy(user_col).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort")
    )
    active = events.select(
        user_col, F.date_trunc(period, F.col(ts_col)).alias("__p")
    ).distinct()
    off = (
        F.datediff(F.col("__p"), F.col("cohort")) / per_day[period]
    ).cast("int")
    return (
        active.join(cohorts, user_col)
        .groupBy("cohort", off.alias("period_offset"))
        .agg(F.count("*").cast("long").alias("n_active"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every ordered pair of event types, how often does
    ``next`` immediately follow ``prev`` in the SAME user's stream,
    and what fraction of ``prev``'s outgoing transitions is that —
    the behavioral fingerprint funnels are hypotheses about (a funnel
    step list is one path through this matrix).

    ``p_next`` is an exact rational (pair count / prev's outgoing
    total) rounded once — no float accumulation, so the identical SQL
    replays bit-for-bit. Sequence order must be made total for
    engine-portable results: pass tie-breaking ``order_cols``
    (default ``[ts, event_id]``).

    NULL handling: a transition OUT of a NULL-typed event keeps
    ``prev_type`` NULL; a transition INTO one is dropped — ``lead()``
    returning NULL is indistinguishable from end-of-sequence, and
    both mean "no successor" here.

    Scale shape: ONE window pass partitioned by user (per-user
    streams are short and numerous — never a global sort), then a
    map-side-combined groupBy on (prev, next) down to |types|^2 rows;
    the outgoing totals come from a window over THAT bounded table,
    not from a second fact pass. Returns
    ``(prev_type, next_type, n, p_next)``.
    """
    from pyspark.sql import Window as W

    order_cols = order_cols or ["ts", "event_id"]
    w = W.partitionBy(user_col).orderBy(*order_cols)
    steps = events.select(
        F.col(type_col).alias("prev_type"),
        F.lead(type_col).over(w).alias("next_type"),
    ).where(F.col("next_type").isNotNull())
    counts = steps.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n")
    )
    wout = W.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(wout), 6).alias("p_next"),
    )


def session_paths(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    *,
    gap_minutes: int = 30,
    min_count: int = 5,
) -> DataFrame:
    """Frequent 3-step journeys WITHIN a session: sessionize each
    user's stream with an inactivity gap (a path spanning a lunch
    break is not a journey), slide a 3-event window over every
    session, and count each ordered path corpus-wide — the
    exploratory mining step that surfaces the funnels worth defining
    (:func:`funnel` then tests them), one level up from
    :func:`event_transitions`' single steps.

    Determinism: sessions cut on integer microsecond gaps
    (``us - prev_us > gap``), total order ``(ts, id_col)``, and the
    emitted count is an exact integer — the identical SQL replays
    bit-for-bit. Paths are complete 3-grams only (a session's last
    two events head no path).

    Scale shape: THREE window passes, all partitioned by user (the
    session-id cumulative sum, then the two leads over (user,
    session)), then one map-side-combined groupBy down to at most
    |types|^3 rows with the ``min_count`` filter on the aggregate.
    Never a global sort. Returns ``(p1, p2, p3, n)``.
    """
    from pyspark.sql import Window as W

    wu = W.partitionBy(user_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    gap_us = gap_minutes * 60 * 1_000_000
    new_sess = (
        F.lag(us).over(wu).isNull()
        | ((us - F.lag(us).over(wu)) > F.lit(gap_us))
    ).cast("long")
    with_sess = events.select(
        user_col,
        type_col,
        ts_col,
        id_col,
        F.sum(new_sess).over(
            wu.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).alias("__sess"),
    )
    wk = W.partitionBy(user_col, "__sess").orderBy(ts_col, id_col)
    grams = with_sess.select(
        F.col(type_col).alias("p1"),
        F.lead(type_col, 1).over(wk).alias("p2"),
        F.lead(type_col, 2).over(wk).alias("p3"),
    ).where(F.col("p2").isNotNull() & F.col("p3").isNotNull())
    return (
        grams.groupBy("p1", "p2", "p3")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= min_count)
        .select("p1", "p2", "p3", F.col("n").cast("long").alias("n"))
    )


def funnel_latency(
    events: DataFrame,
    from_type: str,
    to_type: str,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    probabilities: Sequence[float] = (0.5, 0.9),
) -> DataFrame:
    """Time-to-convert distribution: for every user whose FIRST
    ``from_type`` event is later followed by a ``to_type`` event, the
    delay to the EARLIEST such follow-up — summarized as exact
    interpolated percentiles in seconds. The latency counterpart to
    :func:`funnel_counts`' conversion rates (how MANY convert vs how
    FAST they do).

    Exactness: deltas are integer seconds (microsecond timestamps,
    floor-divided), and the percentile is the standard linear
    interpolation over sorted integers — the same engine-portable
    definition :func:`~.skew.key_skew_report` pins (Spark
    ``percentile`` == DuckDB ``quantile_cont``).

    Scale shape: two user-keyed min-aggregations (first entry event,
    earliest later conversion) joined on the user key, then ONE
    global aggregate over the per-user delta table (one row per
    converting user — orders of magnitude below event volume).
    Returns one row: ``(n_entered, n_converted, p..s columns)``.
    """
    us = F.unix_micros(F.col(ts_col))
    entry_t = (
        events.where(F.col(type_col) == from_type)
        .groupBy(user_col)
        .agg(F.min(us).alias("__t0"))
    )
    conv = (
        events.where(F.col(type_col) == to_type)
        .select(user_col, us.alias("__t1"))
        .join(entry_t, user_col)
        .where(F.col("__t1") >= F.col("__t0"))
        .groupBy(user_col)
        .agg(
            F.min(
                F.expr("(__t1 - __t0) div 1000000")
            ).alias("__delta_s")
        )
    )
    aggs = [
        F.count("*").cast("long").alias("n_converted"),
    ] + [
        F.round(
            F.percentile(F.col("__delta_s"), F.lit(float(p))), 6
        ).alias(f"p{int(p * 100)}_s")
        for p in probabilities
    ]
    stats = conv.agg(*aggs)
    n_entered = entry_t.agg(
        F.count("*").cast("long").alias("n_entered")
    )
    return n_entered.crossJoin(F.broadcast(stats))


def attribution_last_touch(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    window_s: int = 86_400,
    direct_label: str = "direct",
) -> DataFrame:
    """Last-touch conversion attribution: each conversion event
    credits the user's most recent TOUCH event (one of
    ``touch_types``) within ``window_s`` seconds; conversions with no
    in-window touch credit ``direct_label`` — the standard marketing
    attribution rollup, and the IGNORE NULLS window pattern's
    canonical application (the LOCF carry IS the attribution state).

    One user-partitioned window pass (per-user streams — the same
    shape as sessionize/transitions) carrying the last touch's type
    and integer-microsecond timestamp; the window bound is an exact
    integer compare; one bounded groupBy on the credited channel.
    Returns ``(channel, n_conversions)``.
    """
    if conversion_type in touch_types:
        raise ValueError("conversion_type cannot also be a touch type")
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    is_touch = F.col(type_col).isin(list(touch_types))
    w = (
        Window.partitionBy(user_col)
        .orderBy(us, F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        events.withColumn("__us", us)
        .withColumn(
            "__lt_type",
            F.last(F.when(is_touch, F.col(type_col)), True).over(w),
        )
        .withColumn(
            "__lt_us",
            F.last(F.when(is_touch, F.col("__us")), True).over(w),
        )
    )
    conv = carried.where(F.col(type_col) == conversion_type)
    channel = F.when(
        F.col("__lt_us").isNotNull()
        & (F.col("__us") - F.col("__lt_us") <= window_s * 1_000_000),
        F.col("__lt_type"),
    ).otherwise(F.lit(direct_label))
    return (
        conv.select(channel.alias("channel"))
        .groupBy("channel")
        .agg(F.count("*").cast("long").alias("n_conversions"))
    )


def attribution_position_based(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
    window_s: int = 86_400,
    direct_label: str = "direct",
) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: each
    conversion splits one unit of credit over ALL its in-window
    preceding touches — 40% to the first touch, 40% to the last, the
    middle 20% divided evenly among the rest (1 touch -> 100%,
    2 touches -> 50/50); conversions with no in-window touch credit
    ``direct_label``. The standard U-shape complement to
    :func:`attribution_last_touch` (which answers "what closed?",
    while this answers "what opened AND closed?").

    Credit is computed in exact integer PARTS-PER-MILLION so every
    conversion's credit sums to exactly 1,000,000 (the middle share
    is 200000 div (k-2) with the remainder assigned to the first
    middle touch — deterministic, replayable in SQL) and the rollup
    is an exact integer sum at any scale.

    Plan shape: one user-partitioned forward window carries each
    touch to its NEXT conversion (first_value IGNORE NULLS — the
    forward twin of last-touch's LOCF carry); one
    (user, conversion)-partitioned window ranks the touch group; one
    bounded groupBy on channel; the direct row is a left_anti join of
    conversions against credited conversion ids. Returns
    ``(channel, n_touches, credit_ppm, credit)``.
    """
    if conversion_type in touch_types:
        raise ValueError("conversion_type cannot also be a touch type")
    from pyspark.sql import Window as W

    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    is_conv = F.col(type_col) == conversion_type
    is_touch = F.col(type_col).isin(list(touch_types))
    fwd = (
        W.partitionBy(user_col)
        .orderBy(F.col("__us"), F.col(order_col))
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = (
        events.withColumn("__us", us)
        .withColumn(
            "__cv_us", F.first(F.when(is_conv, F.col("__us")), True).over(fwd)
        )
        .withColumn(
            "__cv_id",
            F.first(F.when(is_conv, F.col(order_col)), True).over(fwd),
        )
    )
    touches = carried.where(
        is_touch
        & F.col("__cv_id").isNotNull()
        & (F.col("__cv_us") - F.col("__us") <= window_s * 1_000_000)
    )
    grp = W.partitionBy(user_col, "__cv_id")
    ranked = touches.select(
        F.col(type_col).alias("channel"),
        F.col(user_col),
        "__cv_id",
        F.row_number()
        .over(grp.orderBy(F.col("__us"), F.col(order_col)))
        .alias("__rn"),
        F.count("*").over(grp).alias("__k"),
    )
    share = F.floor(F.lit(200_000) / (F.col("__k") - 2)).cast("long")
    rem = F.lit(200_000) - (F.col("__k") - 2) * share
    ppm = (
        F.when(F.col("__k") == 1, F.lit(1_000_000))
        .when(F.col("__k") == 2, F.lit(500_000))
        .when((F.col("__rn") == 1) | (F.col("__rn") == F.col("__k")), 400_000)
        .when(F.col("__rn") == 2, share + rem)
        .otherwise(share)
        .cast("long")
    )
    credited = ranked.select(
        "channel", user_col, "__cv_id", ppm.alias("__ppm")
    )
    agg = credited.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_touches"),
        F.sum("__ppm").cast("long").alias("credit_ppm"),
    )
    # Direct credit = conversions with no credited touch. Anti-join on
    # the (user, conversion-id) PAIR — keying on the id alone would
    # require order_col to be globally unique: with per-user-unique ids
    # another user's credited conversion sharing the same id would
    # wrongly suppress this user's direct credit.
    convs = carried.where(is_conv).select(
        F.col(user_col).alias("__cu"), F.col(order_col).alias("__cid")
    )
    credited_ids = credited.select(
        F.col(user_col).alias("__cu"), F.col("__cv_id").alias("__cid")
    ).distinct()
    direct = (
        convs.join(credited_ids, ["__cu", "__cid"], "left_anti")
        .agg(F.count("*").alias("__n"))
        .select(
            F.lit(direct_label).alias("channel"),
            F.lit(0).cast("long").alias("n_touches"),
            (F.col("__n") * 1_000_000).cast("long").alias("credit_ppm"),
        )
        .where(F.col("credit_ppm") > 0)
    )
    out = agg.unionByName(direct)
    return out.select(
        "channel",
        "n_touches",
        "credit_ppm",
        F.round(F.col("credit_ppm").cast("double") / 1e6, 6).alias("credit"),
    )


def survival_hazard(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    censor_days: int = 7,
) -> DataFrame:
    """Discrete-time survival / hazard table of user lifetimes — the
    Kaplan–Meier life table (Kaplan & Meier 1958) in its exact-integer
    per-step form: for every lifetime ``t_days`` (days between a
    user's first and last event), the number still at risk entering
    ``t``, the churn events at ``t``, the right-censored users at
    ``t`` (last seen within ``censor_days`` of the observation window
    end — they may still be alive, so they leave the risk set without
    counting as churn), and the discrete hazard ``1e6·d_t div n_t`` in
    exact millionths. This is churn_rates' one-number verdict expanded
    into the full retention curve a lifecycle model actually fits.

    The cumulative KM survival PRODUCT is deliberately NOT emitted:
    a float product (or exp-of-log-sum) accumulates in partition
    order and would flake a bit-replay gate; every emitted column is
    a single exact-integer expression per row (same per-cell-over-
    scalar choice as lang_source_association), and S(t) folds from
    the hazards driver-side if needed.

    Scale shape: one per-user min/max aggregation over the facts
    (the only fact-sized shuffle), a 1-row window-end scalar
    broadcast onto the per-user table, then everything runs on the
    lifetime aggregate — at most observation-window-days rows, so
    its ordered at-risk window is calendar-bounded. Returns
    ``(t_days, n_at_risk, n_churned, n_censored, hazard_ppm)``
    ordered by ``t_days``.
    """
    from pyspark.sql import Window as W

    if censor_days < 0:
        raise ValueError("censor_days must be >= 0")
    per = events.groupBy(F.col(user_col).alias("__u")).agg(
        F.min(F.to_date(ts_col)).alias("__first"),
        F.max(F.to_date(ts_col)).alias("__last"),
    )
    end = per.agg(F.max("__last").alias("__end"))
    lab = per.crossJoin(F.broadcast(end)).select(
        F.datediff("__last", "__first").alias("__t"),
        (F.datediff("__end", "__last") < censor_days).alias("__cen"),
    )
    g = lab.groupBy("__t").agg(
        F.sum(F.when(~F.col("__cen"), 1).otherwise(0)).alias("__d"),
        F.sum(F.when(F.col("__cen"), 1).otherwise(0)).alias("__c"),
    )
    w_risk = (
        W.orderBy(F.col("__t").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        g.withColumn("__n", F.sum(F.col("__d") + F.col("__c")).over(w_risk))
        .select(
            F.col("__t").cast("long").alias("t_days"),
            F.col("__n").cast("long").alias("n_at_risk"),
            F.col("__d").cast("long").alias("n_churned"),
            F.col("__c").cast("long").alias("n_censored"),
            F.expr("(1000000 * __d) DIV __n").cast("long").alias(
                "hazard_ppm"
            ),
        )
        .orderBy("t_days")
    )


def churn_rates(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    decimals: int = 6,
) -> DataFrame:
    """Churn labeling over the observation window's temporal halves:
    users active in the FIRST half who never reappear in the second
    are churned — the standard label builder for retention modeling,
    and the one-number health metric behind every cohort table.
    The midpoint is (min_ts + max_ts)/2 in exact integer microseconds
    (a 1-row scalar aggregate broadcast into the split — the same
    bounded shape as the PSI/KS drift splits).

    Plan: one bounds aggregate, two distinct user sets (each one
    map-side-combined shuffle on the user key), one semi/anti split,
    one fold. Returns one row
    ``(n_active_early, n_retained, n_churned, churn_rate)``.
    """
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    base = events.select(F.col(user_col).alias("__u"), us.alias("__us"))
    # Midpoint via arithmetic shift-right: exact floor((min+max)/2) on
    # longs at ANY magnitude/sign — matches the oracle's DuckDB `//`
    # (floor division) even past 2^53 µs, where a double round-trip
    # would lose bits, and for negative epochs, where truncation and
    # floor diverge.
    bounds = base.agg(
        F.shiftright((F.min("__us") + F.max("__us")).cast("long"), 1)
        .cast("long")
        .alias("__mid")
    )
    from datacamp_etl_spark.operators.spread import scoped_cache

    with_mid = base.crossJoin(F.broadcast(bounds))
    # early is consumed twice (the retention semi-join AND its own
    # count) — cached so the fact scan + distinct shuffle behind it
    # runs once; the pinned relation is one user id per row.
    early = scoped_cache(
        with_mid.where(F.col("__us") <= F.col("__mid"))
        .select("__u")
        .distinct()
    )
    late = (
        with_mid.where(F.col("__us") > F.col("__mid"))
        .select("__u")
        .distinct()
    )
    retained = early.join(late, "__u", "left_semi")
    agg = early.agg(F.count("*").alias("n_active_early")).crossJoin(
        retained.agg(F.count("*").alias("n_retained"))
    )
    return agg.select(
        F.col("n_active_early").cast("long").alias("n_active_early"),
        F.col("n_retained").cast("long").alias("n_retained"),
        (F.col("n_active_early") - F.col("n_retained"))
        .cast("long")
        .alias("n_churned"),
        F.round(
            F.when(
                F.col("n_active_early") > 0,
                (F.col("n_active_early") - F.col("n_retained")).cast(
                    "double"
                )
                / F.col("n_active_early").cast("double"),
            ),
            decimals,
        ).alias("churn_rate"),
    )
