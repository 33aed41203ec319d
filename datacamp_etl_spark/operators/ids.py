"""Distributed ID assignment [EXT].

Assigning contiguous global ids with ``row_number() OVER (ORDER BY
...)`` funnels every row through ONE task — the canonical
accidentally-single-node plan. The scalable shape is two-pass:

1. range-partition by the ordering key, count rows per partition
   (bounded driver collect: one long per partition),
2. broadcast the cumulative offsets and add them to the per-partition
   ``row_number`` (each window covers one partition — parallel).

Same contract as the global sort, shuffle-equivalent cost, no
single-task stage. The reference's serial-id analog is the warehouse
sequence (``loading.rb`` staging ``id serial``); this is the
distributed replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "assign_contiguous_ids",
    "exact_ntile",
    "exact_ntile_multi",
    "exact_quantile_values",
    "global_row_number",
    "global_running_sum",
    "training_order",
    "negative_pairs",
]


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    *,
    rn_col: str = "__rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Add a 1-based global ``row_number`` in the total order of
    ``order_cols`` WITHOUT the single-task global-window stage.
    Returns ``(df_with_rn, total_row_count)`` — the count falls out of
    the offset pass for free.

    Two-pass: range-partition on the order key, count rows per
    partition (bounded driver collect: one long per partition), then
    per-partition ``row_number`` (parallel windows) + broadcast
    cumulative offsets.

    The range-partitioned frame is ``localCheckpoint``-ed BEFORE the
    count pass: ``repartitionByRange`` samples range boundaries with an
    RDD-id-dependent seed, so re-evaluating the plan could draw
    DIFFERENT boundaries and make pass-2 row counts disagree with the
    broadcast offsets (silent duplicate/missing ranks). Checkpointing
    pins one materialized partitioning for both passes — the same
    contract ``graph.py`` uses for iterative lineage.
    """
    parts = df.repartitionByRange(
        *( [num_partitions] if num_partitions else [] ), *order_cols
    ).withColumn("__pid", F.spark_partition_id())
    parts = parts.localCheckpoint()
    # Pass 1: per-partition counts -> cumulative offsets. Bounded by
    # the partition count, never by the data.
    counts = parts.groupBy("__pid").count().orderBy("__pid").collect()
    offsets, acc = {}, 0
    for r in counts:
        offsets[r["__pid"]] = acc
        acc += r["count"]
    off_df = F.broadcast(
        parts.sparkSession.createDataFrame(
            [(p, o) for p, o in offsets.items()], "__pid int, __off long"
        )
    )
    # Pass 2: per-partition row_number (parallel windows) + offset.
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    out = (
        parts.join(off_df, "__pid")
        .withColumn(
            rn_col, (F.row_number().over(w) + F.col("__off")).cast("long")
        )
        .drop("__pid", "__off")
    )
    return out, acc


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    *,
    sum_col: str = "__running",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add the GLOBAL inclusive running sum of ``weight_col`` in the
    total order of ``order_cols`` — the weighted generalization of
    :func:`global_row_number`, with the same no-single-task contract:
    range-partition on the order key, sum weights per partition
    (bounded driver collect: one long per partition), broadcast the
    cumulative offsets, add them to per-partition running sums
    (parallel windows).

    This is the primitive behind global prefix-selection and
    token-balanced sharding (``curation.token_budget_cap`` is the
    per-GROUP case, where the group key partitions the window for
    free; a GLOBAL running total has no such key and would otherwise
    plan the canonical single-task window). Weights are summed as
    BIGINT — fixed-point your weights upstream.
    """
    parts = df.repartitionByRange(
        *([num_partitions] if num_partitions else []), *order_cols
    ).withColumn("__pid", F.spark_partition_id())
    # same boundary-pinning contract as global_row_number: the range
    # sampler is seed-unstable across re-evaluation
    parts = parts.localCheckpoint()
    totals = (
        parts.groupBy("__pid")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("__t"))
        .orderBy("__pid")
        .collect()
    )
    offsets, acc = {}, 0
    for r in totals:
        offsets[r["__pid"]] = acc
        acc += int(r["__t"] or 0)
    off_df = F.broadcast(
        parts.sparkSession.createDataFrame(
            [(p, o) for p, o in offsets.items()], "__pid int, __off long"
        )
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parts.join(off_df, "__pid")
        .withColumn(
            sum_col,
            (
                F.sum(F.col(weight_col).cast("long")).over(w)
                + F.col("__off")
            ).cast("long"),
        )
        .drop("__pid", "__off")
    )


def assign_contiguous_ids(
    df: DataFrame,
    order_cols: list[str],
    *,
    id_col: str = "row_id",
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``id_col`` with contiguous ids ``start..start+n-1`` in the
    total order of ``order_cols`` (which must be a unique key — ties
    would make the order, and thus the ids, nondeterministic)."""
    ranked, _ = global_row_number(
        df, order_cols, rn_col="__grn", num_partitions=num_partitions
    )
    return ranked.withColumn(
        id_col, (F.col("__grn") - 1 + F.lit(start)).cast("long")
    ).drop("__grn")


def exact_ntile(
    df: DataFrame,
    order_cols: list[str],
    buckets: int,
    *,
    bucket_col: str = "bucket",
    num_partitions: int | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """EXACT SQL ``ntile(buckets)`` over a global order — without the
    partitionless WindowExec (single-task global sort) the naive
    ``ntile().over(Window.orderBy(...))`` plans, and WITHOUT moving
    the full table at all.

    Boundary-literal design: the ``buckets - 1`` bucket-END tuples
    (the ``order_cols`` values at ANSI positions: with ``n`` rows,
    ``q = n div buckets``, ``r = n mod buckets``, the first ``r``
    buckets hold ``q+1`` rows) are found by ranking a NARROW
    projection of just ``order_cols`` (one range-exchange of the key
    columns — document bodies, embeddings, etc. never enter a
    shuffle), collected to the driver (bounded: ``buckets - 1``
    tuples), and folded back as literals: each row's bucket is
    ``1 + #(boundaries strictly below its own key tuple)`` — a pure
    projection on the ORIGINAL DataFrame, preserving its partitioning
    and leaving any filter on the bucket scan-pushable.

    ``order_cols`` must be a unique key (ties would make the order
    nondeterministic). NULL order keys sort first (Spark's ASC
    default) and land deterministically in the earliest bucket; a
    NULL landing exactly ON a boundary still raises (a boundary
    literal can't encode SQL null ordering).

    ``carry_cols`` (r13, guide §1.2): when the CALLER's entire row is
    narrow (e.g. score_calibration's (id, score, label)) and the
    input lineage is expensive (a scorer chain), pass the non-order
    columns here. They ride through the one range exchange and the
    output is served FROM the ranking checkpoint — the input lineage
    evaluates ONCE instead of once for the ranking and once for the
    output projection. The returned frame then carries exactly
    ``order_cols + carry_cols + bucket_col`` (range-partitioned, same
    rows/values); bucket construction, boundary collection and the
    NULL-boundary raise are the identical code path.
    """
    if buckets < 1:
        raise ValueError(f"exact_ntile: buckets must be >= 1, got {buckets}")
    if buckets == 1:
        # constant bucket — no ranking pass needed (on an empty input
        # the lit(1) vs lit(None) distinction is unobservable)
        if carry_cols is not None:
            df = df.select(*order_cols, *carry_cols)
        return df.withColumn(bucket_col, F.lit(1).cast("int"))
    narrow = df.select(*order_cols, *(carry_cols or []))
    ranked, n = global_row_number(
        narrow, order_cols, rn_col="__grn", num_partitions=num_partitions
    )
    out_base = ranked.drop("__grn") if carry_cols is not None else df
    if n == 0:
        return out_base.withColumn(bucket_col, F.lit(None).cast("int"))
    q, r = divmod(n, buckets)
    big = r * (q + 1)  # rows living in the q+1-sized buckets
    ends = []
    for b in range(1, buckets):
        pos = b * (q + 1) if b <= r else big + (b - r) * q
        ends.append(max(1, min(pos, n)))
    rows = {
        row["__grn"]: row
        for row in ranked.where(
            F.col("__grn").isin(sorted(set(ends)))
        ).collect()
    }
    bucket = F.lit(1)
    for pos in ends:
        vals = [rows[pos][c] for c in order_cols]
        if any(v is None for v in vals):
            raise ValueError(
                f"exact_ntile: NULL in order_cols at boundary rank {pos}; "
                f"order keys must be NULL-free for the literal-boundary "
                f"plan"
            )
        # lexicographic "row tuple > boundary tuple", innermost-first.
        # Each comparison is coalesced to False so a NULL order key
        # (which global_row_number ranked FIRST under Spark's ASC
        # nulls-first default) compares as "below every boundary" —
        # deterministic bucket 1-ish placement instead of a silent
        # NULL bucket from SQL three-valued logic.
        gt = F.lit(False)
        for c, v in reversed(list(zip(order_cols, vals))):
            gt = F.coalesce(F.col(c) > F.lit(v), F.lit(False)) | (
                F.coalesce(F.col(c) == F.lit(v), F.lit(False)) & gt
            )
        bucket = bucket + gt.cast("int")
    return out_base.withColumn(bucket_col, bucket.cast("int"))


def exact_ntile_multi(
    df: DataFrame,
    metrics: list[tuple],
    buckets: int,
    *,
    tiebreak_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """SEVERAL exact ANSI ``ntile(buckets)`` columns over one input —
    all metrics ranked in a SINGLE range-exchange pass instead of one
    :func:`exact_ntile` call each (guide §2.1: remove shuffles
    outright; §1.2: don't evaluate the input once per metric).

    ``metrics`` is ``[(value, bucket_col), ...]`` where ``value`` is a
    Column (or name) of an INTEGRAL type (BIGINT-castable without loss
    — map dates/timestamps through a strictly monotone injective long
    expression such as ``timestampdiff(MICROSECOND, epoch, col)``
    first; the mapping preserves the sort order and tie structure, so
    bucket values are identical to ranking the original column).
    ``(value, tiebreak_col)`` must be a unique key per metric — same
    contract as :func:`exact_ntile`.

    Shape: each input row explodes into ``len(metrics)`` tagged
    narrow rows ``(metric_idx, value, tiebreak)`` — ONE evaluation of
    the (possibly expensive) input lineage — which rank globally by
    ``(metric_idx, value, tiebreak)`` in one
    :func:`global_row_number` pass. Because every metric contributes
    exactly ``n`` rows, metric ``i``'s rank-``p`` boundary sits at
    global rank ``i*n + p``; ONE bounded collect fetches all
    ``len(metrics) * (buckets-1)`` boundary tuples, and every bucket
    column folds back as literal comparisons in one final projection.
    Versus ``len(metrics)`` sequential exact_ntile calls: range
    exchanges 3 -> 1 (same total shuffled volume), driver jobs
    3*(checkpoint+count+collect) -> 3, and the input lineage (for
    :func:`~datacamp_etl_spark.operators.profile.rfm_segments`, a
    full fact-table aggregation) executes once instead of once per
    metric. NULL semantics match exact_ntile: NULL values rank first
    and land in bucket 1 via the coalesce-False comparisons; a NULL
    ON a boundary raises.
    """
    if buckets < 1:
        raise ValueError(
            f"exact_ntile_multi: buckets must be >= 1, got {buckets}"
        )
    vals = [
        (F.col(v) if isinstance(v, str) else v).cast("long")
        for v, _ in metrics
    ]
    if buckets == 1:
        out = df
        for _, bcol in metrics:
            out = out.withColumn(bcol, F.lit(1).cast("int"))
        return out
    m = len(metrics)
    tagged = (
        df.select(
            F.posexplode(
                F.array(
                    *[
                        F.struct(
                            v.alias("__v"),
                            F.col(tiebreak_col).alias("__tb"),
                        )
                        for v in vals
                    ]
                )
            ).alias("__m", "__s")
        )
        .select(
            "__m",
            F.col("__s.__v").alias("__v"),
            F.col("__s.__tb").alias("__tb"),
        )
    )
    ranked, n_total = global_row_number(
        tagged,
        ["__m", "__v", "__tb"],
        rn_col="__grn",
        num_partitions=num_partitions,
    )
    if n_total == 0:
        out = df
        for _, bcol in metrics:
            out = out.withColumn(bcol, F.lit(None).cast("int"))
        return out
    n = n_total // m
    q, r = divmod(n, buckets)
    big = r * (q + 1)
    ends = []
    for b in range(1, buckets):
        pos = b * (q + 1) if b <= r else big + (b - r) * q
        ends.append(max(1, min(pos, n)))
    wanted = sorted({mi * n + pos for mi in range(m) for pos in set(ends)})
    rows = {
        row["__grn"]: row
        for row in ranked.where(F.col("__grn").isin(wanted)).collect()
    }
    out = df
    for mi, (_, bcol) in enumerate(metrics):
        val = vals[mi]
        bucket = F.lit(1)
        for pos in ends:
            row = rows[mi * n + pos]
            bv, btb = row["__v"], row["__tb"]
            if bv is None or btb is None:
                raise ValueError(
                    f"exact_ntile_multi: NULL in ({metrics[mi][1]}, "
                    f"{tiebreak_col}) at boundary rank {pos}; order keys "
                    f"must be NULL-free for the literal-boundary plan"
                )
            # lexicographic "(value, tiebreak) > boundary", coalesced
            # to False so NULL values deterministically count zero
            # boundaries below them (bucket 1) — exact_ntile parity.
            gt = F.coalesce(
                F.col(tiebreak_col) > F.lit(btb), F.lit(False)
            )
            gt = F.coalesce(val > F.lit(bv), F.lit(False)) | (
                F.coalesce(val == F.lit(bv), F.lit(False)) & gt
            )
            bucket = bucket + gt.cast("int")
        out = out.withColumn(bcol, bucket.cast("int"))
    return out


def exact_quantile_values(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    probs: list[float],
    *,
    num_partitions: int | None = None,
) -> list:
    """EXACT discrete quantiles at scale: the value at 1-based sorted
    position ``max(1, ceil(p * n))`` for each ``p`` — computed with the
    two-pass rank (no single-task sort), then a rank-IN filter whose
    result is ``len(probs)`` rows. ``order_cols`` must start with
    ``value_col`` (plus a tiebreak) for a total order.

    This is the building block for exact winsorize/trim thresholds at
    100 TB: the heavy work is one range-exchange; the driver sees only
    ``len(probs)`` values.
    """
    import math

    # rank a NARROW projection — only the order-key columns make the
    # range-exchange; the full rows never move
    ranked, n = global_row_number(
        df.select(*order_cols),
        order_cols,
        rn_col="__grn",
        num_partitions=num_partitions,
    )
    if n == 0:
        return [None] * len(probs)
    positions = [max(1, math.ceil(p * n)) for p in probs]
    got = {
        row["__grn"]: row[value_col]
        for row in ranked.where(
            F.col("__grn").isin(sorted(set(positions)))
        ).select("__grn", value_col).collect()
    }
    return [got[pos] for pos in positions]


def training_order(df: DataFrame, key_cols: list[str], *, seed: int = 0) -> Column:
    """Deterministic pseudo-random training order: md5 over the key
    (+ seed) — reproducible across engines and runs, re-shuffled by
    changing ``seed``. Use as ``orderBy(training_order(df, [...]))``
    or as the range-partition key of a shuffled write."""
    return F.md5(F.concat_ws("\x1f", F.lit(str(seed)), *key_cols))


def negative_pairs(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for
    every anchor row, ``k`` pseudo-random OTHER rows, emitted as
    ``(anchor_id, neg_rank, negative_id)`` with ``neg_rank`` in
    ``0..k-1``.

    Construction: rows get contiguous positions ``0..n-1`` (md5-hash
    order via :func:`assign_contiguous_ids` — append-shuffled, so ring
    neighbors are unrelated rows), then negative ``j`` of the anchor
    at position ``p`` sits at ``(p + step_j) % n`` where
    ``step_j = 1 + (md5(anchor_id, j) % (n - 1))`` — a ring offset
    that can never be 0, so an anchor never draws itself, and every
    (anchor, j) draw is uniform over the other ``n - 1`` positions.
    Collisions BETWEEN an anchor's k draws are possible (sampling with
    replacement), vanishingly so for k << n.

    Everything is md5-derived integers: the same pairs come out on any
    engine, any layout, any run — resumable training without shipping
    a pair manifest.

    Scale shape: the position assignment is the two-pass
    range-partition of assign_contiguous_ids; the draw itself is one
    explode (k rows per anchor) + ONE equi-join on the contiguous
    position — shuffle-heavy but linear in n*k, never a cross join.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    pos = assign_contiguous_ids(
        df.select(
            id_col, F.md5(F.col(id_col).cast("string")).alias("__h")
        ),
        ["__h", id_col],
        id_col="__pos",
        num_partitions=num_partitions,
    ).drop("__h")
    # total row count rides along without a second scan: max position
    # + 1 broadcast back via a scalar subquery-shaped crossJoin; the
    # ring needs >= 2 rows or `% (n-1)` is a modulo-by-zero that
    # non-ANSI Spark would turn into a silently empty result
    n_row = pos.agg(
        F.when(
            F.max("__pos") + 1 >= 2, F.max("__pos") + 1
        )
        .otherwise(
            F.raise_error("negative_pairs needs >= 2 rows").cast("long")
        )
        .alias("__n")
    )
    anchors = pos.crossJoin(F.broadcast(n_row)).select(
        F.col(id_col).alias("anchor_id"), "__pos", "__n"
    )
    j = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("neg_rank")
    drawn = anchors.select("anchor_id", "__pos", "__n", j)
    step = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.col("anchor_id").cast("string"),
                        F.col("neg_rank").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % (F.col("__n") - 1)
        + 1
    )
    probes = drawn.select(
        "anchor_id",
        "neg_rank",
        ((F.col("__pos") + step) % F.col("__n")).alias("__neg_pos"),
    )
    return probes.join(
        pos.select(F.col(id_col).alias("negative_id"), F.col("__pos").alias("__neg_pos")),
        "__neg_pos",
    ).select("anchor_id", "neg_rank", "negative_id")
