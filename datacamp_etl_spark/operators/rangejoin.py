"""Interval (range) join [EXT] — Spark-first, bin-bucketed.

Spark has no native range join (Databricks' range-join hint is not in
OSS). The naive expression — an equi-join on the key plus a
``l.ts BETWEEN r.start AND r.end`` residual — degenerates when the
key is absent or low-cardinality: Catalyst plans a
BroadcastNestedLoopJoin / CartesianProduct whose candidate set is
``O(|L| x |R|)``.

The scalable expression buckets time into fixed-width **bins**:

1. each left row maps to the single bin containing its timestamp;
2. each right interval EXPLODES to every bin it overlaps (intervals
   spanning ``w`` bins produce ``w`` rows — pick ``bin_width`` near
   the typical interval length so the fan-out is a small constant);
3. an ordinary shuffle/broadcast **equi-join** on ``(key?, bin)``
   meets exactly the candidate pairs whose bins coincide;
4. the precise containment predicate filters residually; a distinct
   guards against intervals matched in multiple bins.

Cost: one narrow shuffle of ``|L| + w x |R|`` rows keyed by
``(key, bin)`` — linear, AQE-splittable on hot bins — instead of a
nested-loop. This is the standard streaming/array-database range-join
build (e.g. Flink interval joins key by time buckets the same way).

The reference has only key equi-joins (``lib/etl/loading.rb:232-250``);
this covers the event-to-validity-window lookups its jobs do with
correlated SQL.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_start: str,
    right_end: str,
    on: str | None = None,
    bin_width: str = "1 day",
    how: str = "inner",
    left_id: str | None = None,
) -> DataFrame:
    """Join each ``left`` row to every ``right`` row whose
    ``[right_start, right_end)`` interval contains ``left_ts``
    (optionally also matching the equi-key ``on``).

    ``bin_width`` is a SQL interval literal (e.g. ``'1 day'``,
    ``'6 hours'``); right intervals longer than a few bins multiply
    their exploded copies accordingly. ``how`` is ``inner`` or
    ``left`` (unmatched left rows padded with NULLs); ``left``
    requires ``left_id``, a column uniquely identifying left rows
    (the unmatched set is recovered by an anti-join on it — matching
    on all left columns would mis-handle NULLs and duplicates).

    Returns all left columns plus all right columns (names must not
    collide; rename upstream).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    if how == "left" and left_id is None:
        raise ValueError("how='left' requires left_id (unique left row key)")
    clash = (set(left.columns) & set(right.columns)) - ({on} if on else set())
    if clash:
        raise ValueError(f"column collision between sides: {sorted(clash)}")

    # bin width in whole seconds (sub-second widths unsupported)
    width_s = F.expr(
        f"timestampdiff(SECOND, TIMESTAMP '1970-01-01 00:00:00', "
        f"TIMESTAMP '1970-01-01 00:00:00' + INTERVAL {bin_width})"
    )

    def _bin(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c) / width_s).cast("long")

    lb = left.withColumn("__bin", _bin(F.col(left_ts)))
    # right explodes to every bin its interval overlaps; end is
    # exclusive, so the last covered bin is bin(end - 1 microsecond)
    rb = right.where(F.col(right_end) > F.col(right_start)).withColumn(
        "__bin",
        F.explode(
            F.sequence(
                _bin(F.col(right_start)),
                _bin(F.col(right_end) - F.expr("INTERVAL 1 MICROSECOND")),
            )
        ),
    )
    keys = ["__bin"] if on is None else [on, "__bin"]
    contained = (F.col(left_ts) >= F.col(right_start)) & (
        F.col(left_ts) < F.col(right_end)
    )
    matched = lb.join(rb, keys).where(contained).drop("__bin")
    if how == "inner":
        return matched
    # left join: recover unmatched left rows by anti-joining on the
    # unique id (covers both bin-miss and containment-miss), pad NULLs
    unmatched = left.join(
        matched.select(left_id).distinct(), [left_id], "left_anti"
    )
    for c in right.columns:
        if c == on:
            continue  # shared equi-key: the left value stands
        unmatched = unmatched.withColumn(
            c, F.lit(None).cast(matched.schema[c].dataType)
        )
    return matched.unionByName(unmatched)
