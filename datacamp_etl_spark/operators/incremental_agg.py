"""Incremental aggregate maintenance [EXT].

Materialized-rollup upkeep without re-scanning the fact table: the
state table keeps DECOMPOSABLE partials (count / sum / min / max —
avg derives as sum/count), each delta batch is aggregated alone, and
the two fold with a union + re-group on the grouping keys.

Scale shape: agg(delta) shuffles only the batch (map-side combine
first), and the merge shuffles state-table rows — bounded by key
cardinality, not fact size. Maintaining a rollup over a 100 TB fact
costs O(|delta| + |state|) per batch instead of O(|fact|). Deltas are
append-only; retractable measures (exact distinct, percentile) need a
different state (sketches — operators/sketch.py) and upsert/late data
belongs to the SCD2/streaming-upsert family (operators/scd.py,
streaming/sinks.py). Replays must be fenced by the batch ledger
(streaming/sinks.py) — the fold is additive, not idempotent.

Extends the reference's load-then-reaggregate pattern
(``loading.rb:70-95`` mapped-append into target tables) with the
maintenance step the reference re-runs as full SQL each batch.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["aggregate_state", "merge_aggregate_state", "selective_refresh"]


def aggregate_state(
    df: DataFrame,
    keys: Sequence[str],
    *,
    count_col: str = "n",
    sum_cols: Sequence = (),
    min_cols: Sequence[str] = (),
    max_cols: Sequence[str] = (),
) -> DataFrame:
    """Aggregate a (full or delta) fact slice into mergeable state:
    ``keys..., n, sum_<c>..., min_<c>..., max_<c>...``. ``sum_cols``
    entries may be Column expressions carrying an ``alias`` of the
    form ``sum_<name>`` (e.g. an exact DECIMAL cast)."""
    aggs = [F.count("*").alias(count_col)]
    for c in sum_cols:
        aggs.append(F.sum(c).alias(f"sum_{c}") if isinstance(c, str) else c)
    aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
    return df.groupBy(*keys).agg(*aggs)


def merge_aggregate_state(
    state: DataFrame,
    delta_state: DataFrame,
    keys: Sequence[str],
    *,
    count_col: str = "n",
) -> DataFrame:
    """Fold a delta's state into the existing state. Column roles are
    carried by the ``sum_``/``min_``/``max_`` naming contract so the
    merge needs no separate measure spec (the state table IS the
    spec). Associative + commutative: chaining batches in any order
    equals one full recompute."""
    merged = state.unionByName(delta_state)
    aggs = [F.sum(count_col).alias(count_col)]
    for c in state.columns:
        if c in keys or c == count_col:
            continue
        if c.startswith("sum_"):
            aggs.append(F.sum(c).alias(c))
        elif c.startswith("min_"):
            aggs.append(F.min(c).alias(c))
        elif c.startswith("max_"):
            aggs.append(F.max(c).alias(c))
        else:
            raise ValueError(
                f"state column {c!r} lacks a mergeable sum_/min_/max_ role"
            )
    return merged.groupBy(*keys).agg(*aggs)


def selective_refresh(
    state: DataFrame,
    fact: DataFrame,
    affected: DataFrame,
    build_state,
    *,
    on: Sequence[str],
) -> DataFrame:
    """Rebuild ONLY the state rows whose ``on`` keys appear in
    ``affected`` (e.g. the hours late data landed in): untouched rows
    pass through an anti-join, affected fact slices re-aggregate via
    ``build_state`` after a LEFT SEMI restriction.

    This is the late-data/correction path the additive fold can't
    cover (merge_aggregate_state can absorb late APPENDS, but not
    updates or deletes). Cost: |state| + the affected slice of the
    fact — when ``on`` aligns with the fact's partition layout the
    semi join IS partition pruning, so a 3-hour correction over a
    100 TB fact reads 3 hours, not the table. ``fact`` must already
    carry the ``on`` columns (precompute e.g. the hour bucket)."""
    keep = state.join(affected, on=list(on), how="left_anti")
    scoped = fact.join(affected, on=list(on), how="left_semi")
    return keep.unionByName(build_state(scoped))
