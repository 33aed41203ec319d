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


def test_q3_broadcasts_dims(spark, sf):
    df = QUERIES["q3_shipping_priority"](spark, sf)
    plans.assert_broadcast_join(df, at_least=2)
    plans.assert_no_cartesian(df)
    plans.assert_filter_pushed(df, "c_mktsegment")


def test_q5_star_join_broadcasts(spark, sf):
    df = QUERIES["q5_local_supplier_volume"](spark, sf)
    plans.assert_broadcast_join(df, at_least=3)
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
