"""Market-basket co-occurrence analysis [EXT] — pairwise association
rules (support / confidence / lift) over order baskets.

The classic Agrawal-Srikant (SIGMOD'93) frequent-itemset view cut to
its pairwise core, which is what retail/affinity dashboards actually
consume: for items a, b

    support(a,b)    = P(a and b)          = n_ab / N
    confidence(a→b) = P(b | a)            = n_ab / n_a
    lift(a,b)       = P(ab) / (P(a)P(b))  = N * n_ab / (n_a * n_b)

Spark-first design: one distinct (basket, item) projection, a within-
basket self equi-join for pairs (the shuffle key is the basket id, so
per-task work is bounded by the largest basket's square — pass
``max_basket_size`` to drop degenerate mega-baskets, the standard
guard), item counts from one map-side-combined groupBy, and the single
scalar N broadcast as a one-row crossJoin. All ratios are fixed-order
IEEE double over exact integer counts, rounded once — replayable in
ANSI SQL for the oracle gate.

The reference has no basket surface (equijoin ETL only,
lib/etl/loading.rb:232-250); [EXT] north-star operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from datacamp_etl_spark.operators.spread import scoped_cache

__all__ = ["basket_pair_lift", "basket_triple_lift"]


def basket_pair_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_pair_count: int = 2,
    max_basket_size: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Pairwise association rules over baskets: returns
    ``(item_a, item_b, n_pair, support, confidence_ab, lift)`` for
    unordered item pairs (item_a < item_b) co-occurring in at least
    ``min_pair_count`` baskets; ``confidence_ab`` is P(b|a).

    Exactness: n_pair / n_a / n_b / N are exact integer counts; the
    three ratios are formed in a fixed operation order and rounded
    once. Basket multiplicity is ignored (distinct items per basket),
    matching the standard itemset semantics.
    """
    items = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    if max_basket_size is not None:
        sz = Window.partitionBy("__b")
        items = (
            items.withColumn("__sz", F.count("*").over(sz))
            .where(F.col("__sz") <= max_basket_size)
            .drop("__sz")
        )
    # the (basket, item) projection feeds every downstream consumer
    # (N scalar, item counts, each self-join leg): materialize it once
    # or each consumer re-runs the source scan + distinct (measured
    # 62 s -> ~15 s for the triple entry at sf1)
    items = scoped_cache(items)
    n_baskets = items.select("__b").distinct().agg(
        F.count("*").alias("__N")
    )
    # item-vocabulary-bounded; consumed by the L1 prune and every lift
    # denominator leg — cached so the groupBy shuffle over the items
    # projection runs once, not once per consumer
    item_counts = scoped_cache(
        items.groupBy("__i").agg(F.count("*").alias("__n"))
    )
    a = items.select("__b", F.col("__i").alias("item_a"))
    b = items.select("__b", F.col("__i").alias("item_b"))
    pairs = (
        a.join(b, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_pair"))
        .where(F.col("n_pair") >= min_pair_count)
    )
    ca = item_counts.select(
        F.col("__i").alias("item_a"), F.col("__n").alias("__na")
    )
    cb = item_counts.select(
        F.col("__i").alias("item_b"), F.col("__n").alias("__nb")
    )
    dd = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        # 1-row basket-count scalar: the only non-equi join, bounded
        # to one row at any data size (plan-audit allowlisted)
        .crossJoin(n_baskets)
        .select(
            "item_a",
            "item_b",
            F.col("n_pair").cast("long").alias("n_pair"),
            F.round(dd("n_pair") / dd("__N"), decimals).alias("support"),
            F.round(dd("n_pair") / dd("__na"), decimals).alias(
                "confidence_ab"
            ),
            F.round(
                dd("__N") * dd("n_pair") / (dd("__na") * dd("__nb")),
                decimals,
            ).alias("lift"),
        )
    )


def basket_triple_lift(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    *,
    min_count: int = 2,
    max_basket_size: int | None = None,
    decimals: int = 6,
) -> DataFrame:
    """Frequent item TRIPLES with support and three-way lift — one
    Apriori level above :func:`basket_pair_lift` (Agrawal & Srikant
    1994, the L1 -> C3 step): returns ``(item_a, item_b, item_c,
    n_triple, support, lift)`` for ordered-by-name triples
    (item_a < item_b < item_c) co-occurring in at least ``min_count``
    baskets, with

        lift = P(abc) / (P(a)·P(b)·P(c)) = N² · n_abc / (n_a·n_b·n_c)

    — the bundle detector pair rules cannot see (three items can be
    pairwise-independent yet strongly tri-associated and vice versa).

    Apriori pruning as the PLAN, not a post-filter: baskets are first
    restricted to L1-frequent items (count >= ``min_count``) — the
    downward-closure property guarantees no frequent triple is lost —
    so the cubic within-basket join enumerates only frequent-item
    triples; with ``max_basket_size`` the per-task unit is bounded by
    the capped basket's cube. The monotonicity that makes the prune
    sound also makes the explicit C3-from-L2 join unnecessary: any
    triple surviving ``n_triple >= min_count`` has all three sub-pairs
    at least as frequent by containment.

    Exactness: all counts are exact integers; support and lift are
    single fixed-order IEEE expressions rounded once. Basket
    multiplicity ignored (distinct items), standard itemset semantics.
    """
    items = df.select(
        F.col(basket_col).alias("__b"), F.col(item_col).alias("__i")
    ).distinct()
    if max_basket_size is not None:
        sz = Window.partitionBy("__b")
        items = (
            items.withColumn("__sz", F.count("*").over(sz))
            .where(F.col("__sz") <= max_basket_size)
            .drop("__sz")
        )
    # the (basket, item) projection feeds every downstream consumer
    # (N scalar, item counts, each self-join leg): materialize it once
    # or each consumer re-runs the source scan + distinct (measured
    # 62 s -> ~15 s for the triple entry at sf1)
    items = scoped_cache(items)
    n_baskets = items.select("__b").distinct().agg(
        F.count("*").alias("__N")
    )
    # item-vocabulary-bounded; consumed by the L1 prune and every lift
    # denominator leg — cached so the groupBy shuffle over the items
    # projection runs once, not once per consumer
    item_counts = scoped_cache(
        items.groupBy("__i").agg(F.count("*").alias("__n"))
    )
    freq1 = item_counts.where(F.col("__n") >= min_count).select("__i")
    # Triple enumeration as a basket-keyed 3-way self equi-join over
    # the CACHED frequent-item projection — measured fastest at sf1
    # (31.8 s) vs a nested-HOF combination explode (133 s: 3-deep
    # lambda chains leave whole-stage codegen, paying per-element
    # interpreter overhead) and vs the uncached join (62.7 s, lineage
    # re-execution). The shuffle key is the basket id, so per-task
    # work is bounded by the capped basket's cube.
    fi = items.join(freq1, "__i", "left_semi")
    a = fi.select("__b", F.col("__i").alias("item_a"))
    b = fi.select("__b", F.col("__i").alias("item_b"))
    c = fi.select("__b", F.col("__i").alias("item_c"))
    triples = (
        a.join(b, "__b")
        .where(F.col("item_a") < F.col("item_b"))
        .join(c, "__b")
        .where(F.col("item_b") < F.col("item_c"))
        .groupBy("item_a", "item_b", "item_c")
        .agg(F.count("*").alias("n_triple"))
        .where(F.col("n_triple") >= min_count)
    )
    ca = item_counts.select(
        F.col("__i").alias("item_a"), F.col("__n").alias("__na")
    )
    cb = item_counts.select(
        F.col("__i").alias("item_b"), F.col("__n").alias("__nb")
    )
    cc = item_counts.select(
        F.col("__i").alias("item_c"), F.col("__n").alias("__nc")
    )
    dd = lambda col: F.col(col).cast("double")  # noqa: E731
    return (
        triples.join(ca, "item_a")
        .join(cb, "item_b")
        .join(cc, "item_c")
        # 1-row basket-count scalar (plan-audit allowlisted)
        .crossJoin(n_baskets)
        .select(
            "item_a",
            "item_b",
            "item_c",
            F.col("n_triple").cast("long").alias("n_triple"),
            F.round(dd("n_triple") / dd("__N"), decimals).alias("support"),
            F.round(
                dd("__N") * dd("__N") * dd("n_triple")
                / (dd("__na") * dd("__nb") * dd("__nc")),
                decimals,
            ).alias("lift"),
        )
    )
