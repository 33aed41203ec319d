"""Scale guardrails: assert the physical plans we rely on at 100 TB —
pushdown at the scan, broadcasts on dim joins, no cartesian products,
pruned columns. A regression here is a 100x cost bug at scale."""

from __future__ import annotations

import pytest

from datacamp_etl_spark import plans
from datacamp_etl_spark.queries import QUERIES


@pytest.fixture(scope="module")
def sf(sf_dir):
    return sf_dir


def test_q1_filter_pushed_and_pruned(spark, sf):
    df = QUERIES["q1_pricing_summary"](spark, sf)
    plans.assert_filter_pushed(df, "l_shipdate")
    # only 5 needed columns read from the 11-column lineitem
    scans = plans.read_schema_columns(df)
    assert any(
        cols <= {"l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"}
        for cols in scans
    ), scans
    plans.assert_column_pruned(df, "l_partkey")


def test_q3_no_forced_fact_broadcast(spark, sf):
    """q3 carries NO broadcast hints (orders/customer scale with sf).
    At test sf Spark's size stats still pick broadcast joins — proving
    hint removal costs nothing locally — and the logical plan must be
    hint-free so a 100 TB run can shuffle instead of OOM."""
    df = QUERIES["q3_shipping_priority"](spark, sf)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed, analyzed
    plans.assert_broadcast_join(df, at_least=2)  # stats-chosen, not forced
    plans.assert_no_cartesian(df)
    plans.assert_filter_pushed(df, "c_mktsegment")


def test_q5_star_join_dims_only_broadcast(spark, sf):
    """q5 hints only nation (25 rows) and region (5): fixed-cardinality
    dims. The fact-side joins are stats/AQE-chosen."""
    df = QUERIES["q5_local_supplier_volume"](spark, sf)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    # exactly the two dim-side hints (nation, region) survive analysis
    assert analyzed.count("ResolvedHint") == 2, analyzed
    plans.assert_broadcast_join(df, at_least=2)
    plans.assert_no_cartesian(df)


def test_mapped_append_pushdown(spark, sf):
    df = QUERIES["mapped_append"](spark, sf)
    plans.assert_filter_pushed(df, "o_totalprice")


def test_incremental_load_watermark_pushdown(spark, sf):
    df = QUERIES["incremental_load"](spark, sf)
    # the watermark predicate must reach the scan (partition pruning at
    # scale when the layout is date-partitioned)
    text = plans.explain_str(df)
    assert "PushedFilters" in text


def test_table_diff_no_cartesian(spark, sf):
    df = QUERIES["table_diff"](spark, sf)
    plans.assert_no_cartesian(df)


def test_update_join_single_shuffle_join(spark, sf):
    df = QUERIES["update_join"](spark, sf)
    plans.assert_no_cartesian(df)


def test_dedup_pipeline_no_cartesian(spark, sf):
    for name in ("dedup_exact", "lsh_candidate_pairs", "ngram_jaccard_pairs",
                 "simhash_signatures"):
        plans.assert_no_cartesian(QUERIES[name](spark, sf))


def test_topk_is_take_ordered(spark, sf):
    df = QUERIES["q3_shipping_priority"](spark, sf)
    assert "TakeOrderedAndProject" in plans.explain_str(df)
    df2 = QUERIES["embedding_topk"](spark, sf)
    assert "TakeOrderedAndProject" in plans.explain_str(df2)


def test_q6_all_predicates_pushed(spark, sf):
    df = QUERIES["q6_revenue_forecast"](spark, sf)
    plans.assert_filter_pushed(df, "l_shipdate")
    plans.assert_filter_pushed(df, "l_discount")
    plans.assert_filter_pushed(df, "l_quantity")
    # 4-column projection from the 11-column lineitem
    plans.assert_column_pruned(df, "l_partkey")
    plans.assert_column_pruned(df, "l_returnflag")


def test_q7_five_way_join_broadcasts_dims(spark, sf):
    df = QUERIES["q7_nation_volume"](spark, sf)
    # only the two nation aliases are FORCED broadcasts; supplier /
    # customer joins are stats/AQE-chosen (they scale with sf)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert analyzed.count("ResolvedHint") == 2, analyzed
    plans.assert_broadcast_join(df, at_least=2)
    plans.assert_no_cartesian(df)


def test_q19_part_disjuncts_pushed_below_join(spark, sf):
    df = QUERIES["q19_disjunctive_pred"](spark, sf)
    plans.assert_no_cartesian(df)
    plans.assert_broadcast_join(df, at_least=1)
    # CNF extraction pushes the quantity disjunction to the lineitem
    # scan and a brand/size disjunction to the part scan
    filters = plans.pushed_filters(df)
    assert any("l_quantity" in f for f in filters), filters
    assert any("p_brand" in f for f in filters), filters


def test_window_suite_single_exchange(spark, sf):
    df = QUERIES["window_suite"](spark, sf)
    # all five window functions share partitionBy(o_custkey): one
    # hash exchange total, however many sorts follow
    assert plans.count_exchanges(df) == 1, plans.explain_str(df)


def test_q13_outer_join_no_cartesian(spark, sf):
    df = QUERIES["q13_order_count_distribution"](spark, sf)
    plans.assert_no_cartesian(df)


def test_q16_distinct_agg_no_forced_broadcast(spark, sf):
    df = QUERIES["q16_supplier_variety"](spark, sf)
    analyzed = df._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed  # part scales with sf
    plans.assert_filter_pushed(df, "p_size")
    plans.assert_no_cartesian(df)


def test_q22_anti_join_no_cartesian(spark, sf):
    df = QUERIES["q22_dormant_customers"](spark, sf)
    # scalar-avg crossJoin is a broadcast nested loop over ONE row —
    # fine; a true CartesianProduct is not
    plans.assert_no_cartesian(df)


def test_asof_join_single_shuffle(spark, sf):
    df = QUERIES["asof_join_last_click"](spark, sf)
    plans.assert_no_cartesian(df)
    # union-merge as-of: no range join, no nested loop
    text = plans.explain_str(df)
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text


@pytest.mark.parametrize(
    "name", ["q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items"]
)
def test_aqe_picks_broadcast_after_hint_removal(spark, sf, name):
    """VERDICT r1 item 8: with the forced fact-table broadcasts gone,
    AQE (or the static size estimate) must still pick broadcast joins
    at local sf — hint removal costs nothing here while fixing the
    100 TB OOM posture. Runs the query to completion so the ADAPTIVE
    final plan is inspected, not the static guess."""
    df = QUERIES[name](spark, sf)
    df.collect()
    text = plans.explain_str(df)
    assert "BroadcastHashJoin" in text, text
    assert "CartesianProduct" not in text


def test_knn_join_no_join_on_corpus_side(spark, sf):
    """knn_join without candidates inlines the (small) query set as
    literals: the corpus side must see NO join operator at all — no
    CartesianProduct, no BroadcastNestedLoopJoin."""
    df = QUERIES["knn_join"](spark, sf)
    text = plans.explain_str(df)
    assert "CartesianProduct" not in text, text
    assert "BroadcastNestedLoopJoin" not in text, text
    # the corpus scan feeds a generator (explode of the literal
    # query array), not a join build side
    assert "Generate explode" in text or "Generate" in text, text


def test_knn_join_rejects_large_query_set_without_candidates(spark, sf):
    from datacamp_etl_spark.operators.similarity import knn_join_topk
    from datacamp_etl_spark.queries import t as load_t

    emb = load_t(spark, sf, "embeddings")
    with pytest.raises(ValueError, match="candidates"):
        knn_join_topk(emb, emb, k=3, max_inline_queries=4).collect()


def test_date_partitioned_staging_prunes(spark, sf, tmp_path):
    """The 100 TB staging layout: date-partitioned parquet + a
    watermark predicate on the partition column must prune at the
    file index (PartitionFilters), not post-scan."""
    from pyspark.sql import functions as F

    from datacamp_etl_spark.queries import t as load_t

    path = str(tmp_path / "events_by_day")
    ev = load_t(spark, sf, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    ev.write.partitionBy("event_date").parquet(path)

    df = spark.read.parquet(path).where(
        F.col("event_date") >= F.lit("2024-01-15").cast("date")
    )
    pf = plans.partition_filters(df)
    assert any("event_date" in f for f in pf), plans.explain_str(df)
    # and the data predicate is NOT re-read as a data filter: the scan
    # reads no event_date column from the files themselves
    for cols in plans.read_schema_columns(df):
        assert "event_date" not in cols


def test_bucketed_tables_join_without_shuffle(spark, sf, tmp_path):
    """K7's Spark analog: co-located bucketed layout. Two tables
    bucketed+sorted on the join key join with ZERO exchanges — at
    100 TB this turns the nightly fact-fact join into a local merge."""
    from pyspark.sql import functions as F

    from datacamp_etl_spark.queries import t as load_t

    o = load_t(spark, sf, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = load_t(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    for df, name, key in ((o, "orders_bkt", "o_orderkey"), (li, "lineitem_bkt", "l_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(tmp_path / name))
            .bucketBy(4, key)
            .sortBy(key)
            .saveAsTable(name)
        )

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = (
            spark.table("orders_bkt")
            .join(
                spark.table("lineitem_bkt"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .groupBy("o_custkey")
            .agg(F.sum("l_quantity").alias("q"))
        )
        text = plans.explain_str(joined)
        assert "SortMergeJoin" in text, text
        # the join itself is exchange-free; only the groupBy shuffles
        assert plans.count_exchanges(joined) == 1, text
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
