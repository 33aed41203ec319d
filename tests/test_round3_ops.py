"""Round-3 operators [EXT]: incremental corpus dedup, Python Data
Source, UDTF lateral chunking."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacamp_etl_spark.operators import dedup as D


def _corpus_and_batch(spark):
    base = "spark filter join group agg window sort merge scan hash"
    near = "spark filter join group agg window sort merge scan vector"
    fresh = "completely different words about cats dogs birds and fish today"
    corpus = spark.createDataFrame(
        [(1, base), (2, "unrelated corpus text holding many other tokens here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (100, base),   # exact dup of corpus doc 1 -> dropped
            (101, near),   # near dup (shares 3 of 4 bands) -> dropped
            (102, fresh),  # novel -> survives
            (103, "x y"),  # < 3 tokens: no shingles, no bands -> survives
        ],
        "doc_id long, text string",
    )
    return corpus, batch


def test_incremental_dedup_drops_only_corpus_matches(spark):
    corpus, batch = _corpus_and_batch(spark)
    idx = D.band_signatures(corpus)
    out = D.incremental_dedup(batch, idx)
    assert sorted(r["doc_id"] for r in out.collect()) == [102, 103]
    # Survivor rows pass through unchanged (full schema preserved).
    assert out.columns == batch.columns


def test_incremental_dedup_is_batch_internal_blind(spark):
    # Two identical docs WITHIN the batch both survive when the corpus
    # has no match: the operator dedups against the index, not intra-batch
    # (intra-batch dedup is dedup_exact/lsh_candidate_pairs' job).
    corpus, _ = _corpus_and_batch(spark)
    twin = "some novel sentence that appears twice in the incoming batch"
    batch = spark.createDataFrame(
        [(200, twin), (201, twin)], "doc_id long, text string"
    )
    out = D.incremental_dedup(batch, D.band_signatures(corpus))
    assert out.count() == 2


def test_band_signatures_shape(spark):
    corpus, _ = _corpus_and_batch(spark)
    bs = D.band_signatures(corpus, bands=4, num_hashes=16)
    rows = bs.collect()
    # every doc with >=3 tokens emits exactly `bands` rows
    assert len(rows) == 2 * 4
    assert set(bs.columns) == {"doc_id", "band", "band_sig"}


def test_pydatasource_striping_is_partition_invariant(spark):
    from datacamp_etl_spark.sources.pydatasource import register_synthdocs

    register_synthdocs(spark)

    def scan(parts):
        return (
            spark.read.format("synthdocs")
            .option("n", 101)
            .option("partitions", parts)
            .load()
        )

    a = sorted(r["id"] for r in scan(3).collect())
    b = sorted(r["id"] for r in scan(7).collect())
    assert a == b == list(range(101))
    # split count is honored by the planner
    assert scan(7).rdd.getNumPartitions() == 7


def test_udtf_chunks_reassemble(spark):
    from datacamp_etl_spark.operators.udtf_ops import register_udtfs

    register_udtfs(spark)
    text = "abcdefghij" * 7 + "xyz"  # 73 chars -> 8 chunks of 10
    spark.createDataFrame([(1, text)], "doc_id long, text string")\
        .createOrReplaceTempView("__t_udtf")
    rows = spark.sql(
        "SELECT c.chunk_idx, c.chunk FROM __t_udtf d, "
        "LATERAL char_chunks(d.text, 10) c"
    ).collect()
    rows.sort(key=lambda r: r["chunk_idx"])
    assert [r["chunk_idx"] for r in rows] == list(range(8))
    assert "".join(r["chunk"] for r in rows) == text
    assert all(len(r["chunk"]) == 10 for r in rows[:-1])
    assert len(rows[-1]["chunk"]) == 3


def test_incremental_dedup_plan_no_cartesian(spark, sf_dir):
    """The batch-vs-corpus probe must be equi-joins end to end: a
    nested-loop anywhere here is an accidental all-pairs comparison."""
    from datacamp_etl_spark import plans
    from datacamp_etl_spark.queries import QUERIES

    df = QUERIES["incremental_dedup_against_corpus"](spark, sf_dir)
    plans.assert_no_cartesian(df)
    phys = df._jdf.queryExecution().executedPlan().toString()
    # hits are probed via LEFT SEMI and removed via LEFT ANTI
    assert "LeftSemi" in phys, phys
    assert "LeftAnti" in phys, phys


def test_posting_lists_single_shuffle_topk(spark, sf_dir):
    """posting_lists: one exchange for the term agg, then TakeOrdered —
    the global index never funnels through one node."""
    from datacamp_etl_spark.queries import QUERIES

    df = QUERIES["posting_lists"](spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in phys, phys


def test_incremental_agg_chained_merges_equal_full_recompute(spark):
    from datacamp_etl_spark.operators.incremental_agg import (
        aggregate_state,
        merge_aggregate_state,
    )

    rows = [(i % 3, float(i), i) for i in range(100)]
    full = spark.createDataFrame(rows, "k int, v double, o long")
    batches = [
        spark.createDataFrame(rows[a:b], "k int, v double, o long")
        for a, b in [(0, 40), (40, 41), (41, 100)]
    ]

    def st(df):
        return aggregate_state(
            df, ["k"], sum_cols=["v"], min_cols=["o"], max_cols=["o"]
        )

    state = st(batches[0])
    for delta in batches[1:]:
        state = merge_aggregate_state(state, st(delta), ["k"])
    expect = {r["k"]: r for r in st(full).collect()}
    got = {r["k"]: r for r in state.collect()}
    assert set(got) == set(expect)
    for k in expect:
        for c in ["n", "sum_v", "min_o", "max_o"]:
            assert got[k][c] == expect[k][c], (k, c)


def test_incremental_agg_rejects_unmergeable_column(spark):
    import pytest

    from datacamp_etl_spark.operators.incremental_agg import (
        merge_aggregate_state,
    )

    bad = spark.createDataFrame([(1, 2, 3.0)], "k int, n long, avg_v double")
    with pytest.raises(ValueError, match="mergeable"):
        merge_aggregate_state(bad, bad, ["k"])


def test_read_evolved_conforms_generations(spark, tmp_path):
    from datacamp_etl_spark.sources.evolution import read_evolved

    v1 = str(tmp_path / "v1")
    v2 = str(tmp_path / "v2")
    spark.createDataFrame([(1, 10), (2, 20)], "id int, a int").write.parquet(v1)
    spark.createDataFrame(
        [(3, "x"), (4, "y")], "id bigint, b string"
    ).write.parquet(v2)

    out = read_evolved(spark, [v1, v2], "id bigint, a int, b string")
    rows = {r["id"]: (r["a"], r["b"]) for r in out.collect()}
    assert rows == {1: (10, None), 2: (20, None), 3: (None, "x"), 4: (None, "y")}
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "int", "string",
    ]


def test_read_evolved_rejects_narrowing(spark, tmp_path):
    import pytest

    from datacamp_etl_spark.sources.evolution import read_evolved

    p = str(tmp_path / "wide")
    spark.createDataFrame([(1,)], "id bigint").write.parquet(p)
    with pytest.raises(ValueError, match="lossy"):
        read_evolved(spark, [p], "id int")


def test_assign_contiguous_ids_matches_global_order(spark):
    from datacamp_etl_spark.operators.ids import assign_contiguous_ids

    df = spark.range(1000).selectExpr(
        "CAST(pmod(id * 2654435761, 1000003) AS LONG) AS k", "id AS payload"
    )
    out = assign_contiguous_ids(df, ["k"], num_partitions=7, start=10)
    rows = sorted(out.collect(), key=lambda r: r["k"])
    assert [r["row_id"] for r in rows] == list(range(10, 1010))
    # ids are dense and unique
    assert len({r["row_id"] for r in rows}) == 1000


def test_assign_contiguous_ids_no_single_partition_window(spark):
    """The plan's windows partition by __pid — there must be no
    single-partition Exchange (the global-sort row_number shape)."""
    from datacamp_etl_spark.operators.ids import assign_contiguous_ids

    df = spark.range(1000).selectExpr("id AS k")
    out = assign_contiguous_ids(df, ["k"], num_partitions=7)
    phys = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in phys, phys


def test_training_order_deterministic_and_seed_sensitive(spark):
    from datacamp_etl_spark.operators.ids import training_order

    df = spark.range(200).selectExpr("id AS k")
    a = [r["k"] for r in df.orderBy(training_order(df, ["k"], seed=1)).collect()]
    b = [r["k"] for r in df.orderBy(training_order(df, ["k"], seed=1)).collect()]
    c = [r["k"] for r in df.orderBy(training_order(df, ["k"], seed=2)).collect()]
    assert a == b
    assert a != c
    assert sorted(a) == list(range(200))


def test_column_profile_counts_nulls_and_distincts(spark):
    from datacamp_etl_spark.operators.profile import column_profile

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (2, 30.0), (None, 30.0)],
        "a int, b double",
    )
    out = {r["column"]: r for r in column_profile(df, ["a", "b"]).collect()}
    assert out["a"]["n"] == 3 and out["a"]["n_null"] == 1
    assert out["a"]["n_distinct"] == 2
    assert out["b"]["min_val"] == 10.0 and out["b"]["max_val"] == 30.0


def test_histogram_clamps_outliers_into_edge_bins(spark):
    from datacamp_etl_spark.operators.profile import numeric_histogram

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (9.5,), (99.0,), (None,)], "v double"
    )
    out = {r["bucket"]: r["n"] for r in
           numeric_histogram(df, "v", lo=0.0, hi=10.0, bins=10).collect()}
    assert out[0] == 2       # -5 clamped down into bucket 0, plus 0.5
    assert out[9] == 2       # 9.5 plus clamped 99.0
    assert sum(out.values()) == 4  # NULL excluded


def test_selective_refresh_handles_corrections(spark):
    """An UPDATE-shaped correction (value changed in one bucket) is
    invisible to additive folds but exact under selective_refresh."""
    from datacamp_etl_spark.operators.incremental_agg import (
        selective_refresh,
    )

    fact_v1 = spark.createDataFrame(
        [(1, "a", 10.0), (1, "b", 5.0), (2, "a", 7.0)], "h int, k string, v double"
    )
    # correction: bucket 1's 'a' row becomes 99.0
    fact_v2 = spark.createDataFrame(
        [(1, "a", 99.0), (1, "b", 5.0), (2, "a", 7.0)], "h int, k string, v double"
    )

    def build(df):
        return df.groupBy("h", "k").agg(F.sum("v").alias("sum_v"))

    state = build(fact_v1)
    affected = spark.createDataFrame([(1,)], "h int")
    out = selective_refresh(state, fact_v2, affected, build, on=["h"])
    got = {(r["h"], r["k"]): r["sum_v"] for r in out.collect()}
    assert got == {(1, "a"): 99.0, (1, "b"): 5.0, (2, "a"): 7.0}
