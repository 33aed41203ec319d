"""Salted skew-join [EXT]: parity with the plain join."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # one hot key (90% of left rows) + a long tail
    left = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(1000)], "k long, v long"
    )
    right = spark.createDataFrame(
        [(i, f"r{i}") for i in range(0, 1000, 7)], "k long, name string"
    )
    plain = left.join(right, "k").select("k", "v", "name")
    salted = salted_join(left, right, ["k"], salt=8).select("k", "v", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_join_left_outer(spark):
    left = spark.createDataFrame([(1, 10), (2, 20)], "k long, v long")
    right = spark.createDataFrame([(1, "a")], "k long, name string")
    out = {
        (r["k"], r["v"], r["name"])
        for r in salted_join(left, right, ["k"], how="left", salt=4).collect()
    }
    assert out == {(1, 10, "a"), (2, 20, None)}


def test_salted_join_rejects_right_preserving(spark):
    import pytest

    left = spark.createDataFrame([(1, 10)], "k long, v long")
    right = spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="left-preserving"):
            salted_join(left, right, ["k"], how=how)
    # semi/anti stay supported: right is exploded to every salt value,
    # so membership semantics are unchanged
    semi = salted_join(left, right, ["k"], how="left_semi", salt=4)
    assert [r["k"] for r in semi.collect()] == [1]
    anti = salted_join(left, right, ["k"], how="left_anti", salt=4)
    assert anti.collect() == []


def test_salt_spreads_hot_key(spark):
    left = spark.createDataFrame([(1, i) for i in range(500)], "k long, v long")
    salts = (
        left.withColumn(
            "__salt", (F.abs(F.xxhash64("k", "v")) % 8).cast("int")
        )
        .select("__salt")
        .distinct()
        .count()
    )
    assert salts == 8  # the hot key fans out over every sub-key
