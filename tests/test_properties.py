"""Property-based invariants (hypothesis) for the algebra the scale
story depends on: state folds must be partition-order-free, schema
conformance idempotent, id assignment a bijection. Small example
counts — each example runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # key
        st.integers(min_value=-1000, max_value=1000),   # value
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rows_strategy, cut=st.integers(min_value=0, max_value=40))
@settings(**SETTINGS)
def test_state_fold_is_split_invariant(spark, rows, cut):
    """agg(full) == merge(agg(prefix), agg(suffix)) for ANY split
    point — the invariant that makes incremental maintenance exact."""
    from datacamp_etl_spark.operators.incremental_agg import (
        aggregate_state,
        merge_aggregate_state,
    )

    cut = min(cut, len(rows) - 1)
    schema = "k int, v long"
    full = spark.createDataFrame(rows, schema)

    def st_(data):
        return aggregate_state(
            spark.createDataFrame(data, schema) if data else
            spark.createDataFrame([], schema),
            ["k"], sum_cols=["v"], min_cols=["v"], max_cols=["v"],
        )

    merged = merge_aggregate_state(st_(rows[:cut]), st_(rows[cut:]), ["k"])
    want = {
        r["k"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in aggregate_state(
            full, ["k"], sum_cols=["v"], min_cols=["v"], max_cols=["v"]
        ).collect()
    }
    got = {
        r["k"]: (r["n"], r["sum_v"], r["min_v"], r["max_v"])
        for r in merged.collect()
    }
    assert got == want


@given(
    vals=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(-5, 5)),
        min_size=1, max_size=30, unique_by=lambda t: t[0],
    )
)
@settings(**SETTINGS)
def test_conform_is_idempotent_and_order_stable(spark, vals):
    from datacamp_etl_spark.sources.evolution import conform_to_schema

    df = spark.createDataFrame(vals, "id long, a int")
    target = spark.createDataFrame([], "a long, b string, id long").schema
    once = conform_to_schema(df, target)
    twice = conform_to_schema(once, target)
    assert once.schema == twice.schema
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )


@given(
    keys=st.lists(
        st.integers(min_value=-10**9, max_value=10**9),
        min_size=1, max_size=50, unique=True,
    )
)
@settings(**SETTINGS)
def test_contiguous_ids_are_a_dense_order_isomorphism(spark, keys):
    from datacamp_etl_spark.operators.ids import assign_contiguous_ids

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    out = assign_contiguous_ids(df, ["k"], num_partitions=3)
    rows = sorted(out.collect(), key=lambda r: r["k"])
    assert [r["row_id"] for r in rows] == list(range(len(keys)))


@given(
    keys=st.lists(
        st.integers(min_value=-10**6, max_value=10**6),
        min_size=1, max_size=60, unique=True,
    ),
    buckets=st.integers(min_value=1, max_value=12),
)
@settings(**SETTINGS)
def test_exact_ntile_matches_spec_for_any_size(spark, keys, buckets):
    """exact_ntile == the ANSI ntile contract for ANY (n, buckets):
    first n%b buckets hold n//b+1 rows, the rest n//b, assigned in
    key order — including n < buckets and n % buckets == 0."""
    from datacamp_etl_spark.operators.ids import exact_ntile

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = {
        r["k"]: r["bucket"]
        for r in exact_ntile(df, ["k"], buckets, num_partitions=3).collect()
    }
    n, b = len(keys), buckets
    q, r = divmod(n, b)
    want, rank = {}, 0
    for k in sorted(keys):
        bucket, acc = 1, q + 1 if r >= 1 else q
        while rank >= acc:
            bucket += 1
            acc += q + 1 if bucket <= r else q
        want[k] = bucket
        rank += 1
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from([f"t{i}" for i in range(12)]),
            min_size=3, max_size=14,
        ),
        min_size=2, max_size=6,
    ),
    thr=st.sampled_from([0.07, 0.3, 0.5, 0.55, 0.8]),
)
@settings(**SETTINGS)
def test_containment_prefix_prune_is_lossless(spark, docs, thr):
    """The asymmetric-PPJoin prefix filter must be a pure PRUNE: for
    ANY corpus and threshold, strategy='prefix' returns exactly the
    pairs strategy='expand' does — including thresholds whose float
    product rounds above the exact integer (0.55*100) and dense
    corpora where every shingle is hot."""
    from datacamp_etl_spark.operators.dedup import containment_pairs

    frame = spark.createDataFrame(
        [(i, " ".join(words)) for i, words in enumerate(docs)],
        "doc_id long, text string",
    )
    out = {}
    for strategy in ("expand", "prefix"):
        out[strategy] = {
            (r["id_a"], r["id_b"], r["n_common"], r["n_a"])
            for r in containment_pairs(
                frame, threshold=thr, strategy=strategy
            ).collect()
        }
    assert out["prefix"] == out["expand"]
