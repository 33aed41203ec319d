"""Exact order-statistics machinery [EXT]: global_row_number /
exact_ntile / exact_quantile_values (operators/ids.py) and the
operators built on them (curation.winsorize, percentile_trim). These
replace partitionless-WindowExec plans with range-exchange + parallel
windows — the plan shape is asserted here too."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from datacamp_etl_spark.operators.ids import (
    exact_ntile,
    exact_quantile_values,
    global_row_number,
)


def _shuffled(spark, n=997):
    # deterministic scramble: md5-ordered ids with a value column
    return (
        spark.range(n)
        .select(
            F.col("id"),
            (F.col("id") * 37 % 1000).alias("v"),
        )
        .orderBy(F.md5(F.col("id").cast("string")))
    )


def test_global_row_number_is_contiguous_and_ordered(spark):
    df = _shuffled(spark)
    out, n = global_row_number(df, ["v", "id"], rn_col="rn")
    assert n == 997
    rows = out.orderBy("rn").collect()
    assert [r["rn"] for r in rows] == list(range(1, 998))
    keys = [(r["v"], r["id"]) for r in rows]
    assert keys == sorted(keys)


def test_exact_ntile_matches_sql_ntile(spark):
    df = _shuffled(spark, n=103)
    got = {
        r["id"]: r["bucket"]
        for r in exact_ntile(df, ["v", "id"], 10, bucket_col="bucket").collect()
    }
    w = Window.orderBy("v", "id")
    want = {
        r["id"]: r["b"]
        for r in df.withColumn("b", F.ntile(10).over(w)).collect()
    }
    assert got == want
    # bucket sizes: 103 = 10*10 + 3 -> three 11s then seven 10s
    sizes = sorted(
        (list(got.values()).count(b) for b in range(1, 11)), reverse=True
    )
    assert sizes == [11, 11, 11] + [10] * 7


def test_exact_ntile_fewer_rows_than_buckets(spark):
    df = spark.range(4).select(F.col("id"), F.col("id").alias("v"))
    out = exact_ntile(df, ["v", "id"], 10, bucket_col="bucket").collect()
    assert sorted(r["bucket"] for r in out) == [1, 2, 3, 4]


def test_exact_ntile_rejects_nonpositive_buckets(spark):
    df = spark.range(4).select(F.col("id"), F.col("id").alias("v"))
    with pytest.raises(ValueError, match="buckets must be >= 1"):
        exact_ntile(df, ["v", "id"], 0)
    with pytest.raises(ValueError, match="buckets must be >= 1"):
        exact_ntile(df, ["v", "id"], -3)


def test_exact_ntile_null_keys_land_in_first_bucket(spark):
    # a NULL order key sorts first (Spark ASC nulls-first); when it is
    # OFF the bucket boundaries it must get the DEFINED bucket its rank
    # implies (1), not a silent SQL-NULL bucket. n=6, buckets=3 puts
    # boundaries at ranks 2 and 4 — both non-NULL rows here.
    rows = [(0, None), (1, 10), (2, 20), (3, 30), (4, 40), (5, 50)]
    df = spark.createDataFrame(rows, "id long, v int")
    got = {
        r["id"]: r["bucket"]
        for r in exact_ntile(df, ["v", "id"], 3, bucket_col="bucket").collect()
    }
    assert None not in got.values()
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3}


def test_exact_ntile_null_on_boundary_still_raises(spark):
    rows = [(0, None), (1, None), (2, 10), (3, 20), (4, 30), (5, 40)]
    df = spark.createDataFrame(rows, "id long, v int")
    with pytest.raises(ValueError, match="NULL in order_cols"):
        exact_ntile(df, ["v", "id"], 3)


def test_exact_quantile_values(spark):
    df = _shuffled(spark, n=200)
    vals = sorted((r["v"], r["id"]) for r in df.collect())
    lo, med, hi = exact_quantile_values(
        df, "v", ["v", "id"], [0.05, 0.5, 0.95]
    )
    assert lo == vals[max(1, math.ceil(0.05 * 200)) - 1][0]
    assert med == vals[math.ceil(0.5 * 200) - 1][0]
    assert hi == vals[math.ceil(0.95 * 200) - 1][0]
    assert exact_quantile_values(
        df.where(F.lit(False)), "v", ["v", "id"], [0.5]
    ) == [None]


def test_winsorize_clips_tails_only(spark):
    from datacamp_etl_spark.operators.curation import winsorize

    df = _shuffled(spark, n=400)
    out = winsorize(df, "v", "id", lo=0.1, hi=0.9, out_col="w")
    rows = out.collect()
    assert len(rows) == 400  # winsorize keeps every row
    lo, hi = exact_quantile_values(df, "v", ["v", "id"], [0.1, 0.9])
    for r in rows:
        assert r["w"] == min(max(r["v"], lo), hi)


def test_orderstats_plans_have_no_global_window(spark):
    from tests.test_plan_audit import global_window_lines

    df = _shuffled(spark)
    for frame in (
        exact_ntile(df, ["v", "id"], 10),
        global_row_number(df, ["v", "id"])[0],
    ):
        phys = frame._jdf.queryExecution().executedPlan().toString()
        assert not global_window_lines(phys), phys


def test_token_entropy_and_oov_rate(spark):
    from datacamp_etl_spark.operators.text import oov_rate, token_entropy

    docs = spark.createDataFrame(
        [
            (1, "the the the the"),          # zero entropy, all in vocab
            (2, "alpha beta gamma delta"),   # max entropy for 4 tokens
            (3, ""),                         # no tokens -> absent
        ],
        "doc_id long, text string",
    )
    ent = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert set(ent) == {1, 2}
    assert ent[1]["entropy"] == 0.0
    assert abs(ent[2]["entropy"] - round(math.log(4), 6)) < 1e-9
    # vocab_size=2: 'the' dominates; alphabetical tiebreak fills slot 2
    oov = {r["doc_id"]: r for r in oov_rate(docs, vocab_size=2).collect()}
    assert oov[1]["n_oov"] == 0 and oov[1]["oov_rate"] == 0.0
    assert oov[2]["n_tokens"] == 4 and oov[2]["n_oov"] == 3
    assert oov[2]["oov_rate"] == 0.75


def test_exact_ntile_multi_matches_sequential_exact_ntile(spark):
    # the single-pass multi ranking must reproduce exact_ntile
    # bucket-for-bucket on every metric, with ties in the values
    # (v = id*37 % 1000 repeats) and n % buckets != 0
    from datacamp_etl_spark.operators.ids import exact_ntile_multi

    df = _shuffled(spark, n=103).select(
        "id",
        "v",
        (F.col("id") * 13 % 7).alias("w"),
        (1000 - F.col("id")).alias("u"),
    )
    multi = exact_ntile_multi(
        df,
        [(F.col("v"), "bv"), (F.col("w"), "bw"), (F.col("u"), "bu")],
        5,
        tiebreak_col="id",
    )
    got = {r["id"]: (r["bv"], r["bw"], r["bu"]) for r in multi.collect()}
    seq = exact_ntile(df, ["v", "id"], 5, bucket_col="bv")
    seq = exact_ntile(seq, ["w", "id"], 5, bucket_col="bw")
    seq = exact_ntile(seq, ["u", "id"], 5, bucket_col="bu")
    want = {r["id"]: (r["bv"], r["bw"], r["bu"]) for r in seq.collect()}
    assert got == want


def test_exact_ntile_multi_edge_cases(spark):
    from datacamp_etl_spark.operators.ids import exact_ntile_multi

    # fewer rows than buckets: ANSI semantics (one row per bucket)
    df = spark.range(4).select(F.col("id"), F.col("id").alias("v"))
    out = exact_ntile_multi(
        df, [(F.col("v"), "b")], 10, tiebreak_col="id"
    ).collect()
    assert sorted(r["b"] for r in out) == [1, 2, 3, 4]
    # buckets=1: constant bucket, no ranking pass
    out1 = exact_ntile_multi(
        df, [(F.col("v"), "b")], 1, tiebreak_col="id"
    ).collect()
    assert [r["b"] for r in out1] == [1, 1, 1, 1]
    # empty input: NULL buckets, matching exact_ntile
    empty = df.where(F.lit(False))
    oute = exact_ntile_multi(
        empty, [(F.col("v"), "b")], 3, tiebreak_col="id"
    )
    assert oute.count() == 0 and "b" in oute.columns
    # NULL value on a boundary raises, like exact_ntile
    rows = [(0, None), (1, None), (2, 10), (3, 20), (4, 30), (5, 40)]
    dfn = spark.createDataFrame(rows, "id long, v int")
    with pytest.raises(ValueError, match="NULL in"):
        exact_ntile_multi(dfn, [(F.col("v"), "b")], 3, tiebreak_col="id")
    # NULL value OFF the boundaries lands in bucket 1 deterministically
    rows2 = [(0, None), (1, 10), (2, 20), (3, 30), (4, 40), (5, 50)]
    dfn2 = spark.createDataFrame(rows2, "id long, v int")
    got = {
        r["id"]: r["b"]
        for r in exact_ntile_multi(
            dfn2, [(F.col("v"), "b")], 3, tiebreak_col="id"
        ).collect()
    }
    assert got == {0: 1, 1: 1, 2: 2, 3: 2, 4: 3, 5: 3}


def test_exact_ntile_carry_cols_matches_default(spark):
    # carry mode serves the output from the ranking checkpoint; rows,
    # values and bucket assignment must equal the default path
    df = _shuffled(spark, n=103).select(
        "id", "v", (F.col("id") % 2).alias("y")
    )
    want = {
        (r["id"], r["v"], r["y"]): r["bucket"]
        for r in exact_ntile(df, ["v", "id"], 7, bucket_col="bucket").collect()
    }
    got_df = exact_ntile(
        df, ["v", "id"], 7, bucket_col="bucket", carry_cols=["y"]
    )
    assert sorted(got_df.columns) == ["bucket", "id", "v", "y"]
    got = {
        (r["id"], r["v"], r["y"]): r["bucket"] for r in got_df.collect()
    }
    assert got == want
    # buckets=1 and empty-input shapes hold in carry mode too
    one = exact_ntile(df, ["v", "id"], 1, carry_cols=["y"])
    assert sorted(one.columns) == ["bucket", "id", "v", "y"]
    empty = exact_ntile(
        df.where(F.lit(False)), ["v", "id"], 3, carry_cols=["y"]
    )
    assert empty.count() == 0 and "bucket" in empty.columns
