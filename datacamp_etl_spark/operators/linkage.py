"""Probabilistic record linkage [EXT] — Fellegi–Sunter decision model
over blocked candidate pairs.

The engine's fuzzy-matching surface (blocked Levenshtein pairs, see
``queries.py:fuzzy_name_pairs``) stops at a single-field distance; a
real entity-resolution pipeline scores MULTIPLE field comparisons and
classifies each pair as match / possible / non-match. That is the
Fellegi–Sunter model (Fellegi & Sunter, "A Theory for Record Linkage",
JASA 64, 1969): each field comparison contributes a log-odds weight —
log2(m/u) on agreement, log2((1-m)/(1-u)) on disagreement — and the
pair's total weight is compared against two thresholds.

Spark-first design:
- candidate pairs come from a BLOCK equi-join (the shuffle key is the
  block; block size bounds per-task work — never an all-pairs cross
  join), exactly like the LSH-banding dedup operators;
- the weights are fixed DECIMAL literals (trained offline or set by
  domain review, as in classic FS deployments), so scoring is a pure
  column expression — whole-stage-codegen, no UDF, and the score is
  exact (order-independent decimal sums) for the DuckDB oracle gate.

Reference parity anchor: the reference has no linkage surface (its
joins are key equijoins, lib/etl/loading.rb:232-250); this is an [EXT]
north-star operator in the dedup/curation family.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["FieldComparator", "blocked_pairs", "fs_score_pairs"]

#: decimal type wide enough for any realistic weight sum, scale 1 so
#: one-decimal weights stay exact and render identically cross-engine
_W_TYPE = "decimal(8,1)"


@dataclass(frozen=True)
class FieldComparator:
    """One field comparison: ``condition`` is a boolean Column over the
    pair frame (columns suffixed ``_a`` / ``_b``); weights are decimal
    STRINGS with one decimal place (kept exact end-to-end)."""

    name: str
    condition: Column
    agree_weight: str
    disagree_weight: str


def blocked_pairs(
    records: DataFrame,
    key_col: str,
    block_col: str,
    *,
    suffixes: tuple[str, str] = ("_a", "_b"),
) -> DataFrame:
    """Candidate pairs within each block: every column of ``records``
    appears twice with the given suffixes; pairs are ordered
    (key_a < key_b) so each unordered pair appears once. The block
    equi-join is the only shuffle; per-task work is bounded by the
    square of the largest block (the blocker's contract, same as LSH
    banding's mega-bucket story)."""
    sa, sb = suffixes
    a = records.select(
        [F.col(c).alias(f"{c}{sa}") for c in records.columns]
    )
    b = records.select(
        [F.col(c).alias(f"{c}{sb}") for c in records.columns]
    )
    return a.join(
        b,
        (F.col(f"{block_col}{sa}") == F.col(f"{block_col}{sb}"))
        & (F.col(f"{key_col}{sa}") < F.col(f"{key_col}{sb}")),
    )


def fs_score_pairs(
    pairs: DataFrame,
    comparators: list[FieldComparator],
    *,
    match_threshold: str,
    non_match_threshold: str,
    score_col: str = "score",
    decision_col: str = "decision",
) -> DataFrame:
    """Score each candidate pair with the Fellegi–Sunter sum of field
    weights and classify against the two thresholds.

    Adds, per comparator, an ``<name>_agree`` int flag (1/0), then
    ``score`` (decimal, exact) and ``decision`` in
    {'match', 'possible', 'non_match'}. All columns of ``pairs`` are
    preserved; the caller projects what it needs (column pruning
    removes the rest from the plan)."""
    out = pairs
    total = F.lit("0.0").cast(_W_TYPE)
    for c in comparators:
        flag = F.when(c.condition, F.lit(1)).otherwise(F.lit(0))
        out = out.withColumn(f"{c.name}_agree", flag)
        w = (
            F.when(
                F.col(f"{c.name}_agree") == 1,
                F.lit(c.agree_weight).cast(_W_TYPE),
            ).otherwise(F.lit(c.disagree_weight).cast(_W_TYPE))
        )
        total = (total + w).cast(_W_TYPE)
    out = out.withColumn(score_col, total)
    return out.withColumn(
        decision_col,
        F.when(
            F.col(score_col) >= F.lit(match_threshold).cast(_W_TYPE),
            F.lit("match"),
        )
        .when(
            F.col(score_col) <= F.lit(non_match_threshold).cast(_W_TYPE),
            F.lit("non_match"),
        )
        .otherwise(F.lit("possible")),
    )
