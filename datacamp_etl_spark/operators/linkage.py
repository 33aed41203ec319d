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

__all__ = [
    "FieldComparator",
    "block_stats",
    "blocked_pairs",
    "fs_score_pairs",
]

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
    max_block_size: int | None = 10_000,
) -> DataFrame:
    """Candidate pairs within each block: every column of ``records``
    appears twice with the given suffixes; pairs are ordered
    (key_a < key_b) so each unordered pair appears once. The block
    equi-join is the only shuffle; per-task work is bounded by the
    square of the largest block (the blocker's contract, same as LSH
    banding's mega-bucket story).

    ``max_block_size`` is that contract made ENFORCEABLE: one skewed
    block key (a common surname prefix at 100 TB) holding m records
    would emit m^2/2 pairs from a single join key — a straggler task
    no AQE split can break up. Blocks above the cap are dropped
    entirely, mirroring ``dedup.lsh_candidate_pairs``'
    ``max_bucket_size`` mega-bucket guard (an over-cap block carries
    no linkage signal a reviewer could act on anyway — it means the
    blocking key is too coarse and should be refined, e.g. a longer
    prefix or a compound key). Set ``None`` to disable. The window
    count rides the SAME exchange the pair join shuffles on — one
    extra aggregation, no extra shuffle.
    """
    if max_block_size is not None:
        from pyspark.sql import Window as W

        wcnt = W.partitionBy(block_col)
        records = (
            records.withColumn("__blkn", F.count("*").over(wcnt))
            .where(F.col("__blkn") <= max_block_size)
            .drop("__blkn")
        )
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


def block_stats(
    records: DataFrame,
    block_col: str,
    *,
    max_block_size: int = 10_000,
) -> DataFrame:
    """Blocking-key pre-flight report: per block, the record count,
    the pair count it would emit (n*(n-1)/2 — the per-task work the
    join actually does) and whether :func:`blocked_pairs` would drop
    it at ``max_block_size``. Run this BEFORE a linkage job to see
    what a blocking key costs and what the guard will skip — the
    linkage twin of ``skew.key_skew_report``. One map-side-combined
    groupBy; output is one row per distinct block key."""
    return (
        records.groupBy(F.col(block_col).alias("block"))
        .agg(F.count("*").alias("__n"))
        .select(
            "block",
            F.col("__n").cast("long").alias("n_records"),
            F.shiftright(
                (F.col("__n") * (F.col("__n") - 1)).cast("long"), 1
            )
            .cast("long")
            .alias("n_pairs"),
            (F.col("__n") > max_block_size).alias("over_cap"),
        )
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
