"""Bloom prefilter properties (operators/bloom.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.bloom import (
    bloom_build,
    bloom_prefilter,
    bloom_semi_join,
)


def test_no_false_negatives_and_exact_composition(spark, sf_dir):
    from datacamp_etl_spark.queries import t

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    keys = (
        t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
        .limit(50)
    )
    exact = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.join(keys.distinct(), "l_orderkey", "left_semi").collect()
    }
    got = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in bloom_semi_join(li, keys, "l_orderkey").collect()
    }
    assert got == exact and exact  # identical, and non-trivial
    # hash-path equivalence: the production xxhash64 default and the
    # oracle-replayable md5 path compose to the SAME exact result
    # (only the transient false-positive set may differ)
    got_md5 = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in bloom_semi_join(li, keys, "l_orderkey", hash_fn="md5").collect()
    }
    assert got_md5 == exact


def test_prefilter_prunes_most_rows(spark, sf_dir):
    from datacamp_etl_spark.queries import t

    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    keys = li.distinct().limit(20)
    bits = bloom_build(keys, "l_orderkey")
    kept = bloom_prefilter(li, "l_orderkey", bits).count()
    total = li.count()
    # 20 keys against the whole fact table: the filter must remove the
    # overwhelming majority (false-positive rate at 2^17 bits is ~0)
    assert kept < total * 0.05


def test_bitset_size_is_bounded(spark):
    df = spark.range(10_000).select(F.col("id").alias("k"))
    bits = bloom_build(df, "k", num_bits=1 << 12)
    assert len(bits) == (1 << 12) // 64
    assert any(w != 0 for w in bits)
