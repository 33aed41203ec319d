"""As-of join [EXT] — point-in-time lookup, Spark-first.

Spark has no native ASOF JOIN. The scalable expression is the
union-merge pattern rather than a range join:

1. tag both sides and union them on ``(key, ts)`` — one narrow shuffle
   on the key, no ``left.ts >= right.ts`` range-join explosion;
2. sort within the key partition once (right rows before left rows at
   equal timestamps, so "at or before" semantics include ties);
3. carry the latest right-side values forward with
   ``last(..., ignorenulls=True)`` over an unbounded-preceding window.

Cost at 100 TB: one shuffle of ``|L| + |R|`` narrow rows + one window
pass — vs. a range join whose candidate set is ``O(|L| * |R| / keys)``.
The reference has no as-of operator (its only joins are key equijoins,
``lib/etl/loading.rb:232-250``); this is a north-star [EXT] addition.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For every ``left`` row, attach the ``right`` row with the
    greatest ``right_ts <= left_ts`` for the same ``on`` key (backward
    as-of; NULLs where no prior right row exists).

    ``right_cols`` are the right columns to carry (must not collide
    with left column names). Among right rows tied on ``right_ts``,
    the greatest ``tiebreak`` value wins (deterministic output).
    """
    right_cols = list(right_cols)
    if not right_cols:
        raise ValueError("right_cols must name at least one column to carry")
    clash = set(right_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right_cols collide with left columns: {sorted(clash)}")

    order_tb = tiebreak if tiebreak is not None else right_cols[0]
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(order_tb).alias("__tb"),
        *[F.col(c) for c in right_cols],
    )
    lt = left.select(
        "*",
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(rt.schema["__tb"].dataType).alias("__tb"),
    )
    merged = lt.unionByName(rt, allowMissingColumns=True)

    w = (
        W.partitionBy(on)
        .orderBy("__ts", "__side", "__tb")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Carry ONE struct of all right columns, not each independently:
    # last(col, ignorenulls) per column would back-fill a NULL field of
    # the winning right row from an OLDER right row, mixing values from
    # different rows. The struct is non-null exactly for right rows, so
    # every carried field comes from the same (latest) right row.
    rstruct = F.when(
        F.col("__side") == 0, F.struct(*[F.col(c) for c in right_cols])
    )
    carried = merged.select(
        "*",
        F.last(rstruct, ignorenulls=True).over(w).alias("__carry"),
    )
    out = carried.where(F.col("__side") == 1).select(
        *left.columns,
        *[F.col(f"__carry.{c}").alias(c) for c in right_cols],
    )
    return out
