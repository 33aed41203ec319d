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


# ---------------------------------------------------------------------
# Round-10b operator invariants
# ---------------------------------------------------------------------

edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=7),
        st.integers(min_value=0, max_value=7),
    ),
    min_size=1,
    max_size=16,
)


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_triangle_counts_match_bruteforce(spark, edges):
    """Distributed degree-ordered triangle counting equals the O(n^3)
    brute force on ANY small graph (dupes/self-loops/reversals
    included) — per node, not just in total."""
    from itertools import combinations

    from datacamp_etl_spark.operators.graph import triangle_counts

    adj = {}
    for a, b in edges:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    expected = {n: 0 for n in adj}
    for x, y, z in combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            expected[x] += 1
            expected[y] += 1
            expected[z] += 1
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }
    assert got == expected


@given(edges=edges_strategy)
@settings(**SETTINGS)
def test_ppr_ranks_conserve_and_stay_nonnegative(spark, edges):
    """Personalized PageRank mass conserves to exactly 1 and stays
    non-negative on any graph, any seed choice."""
    from datacamp_etl_spark.operators.graph import personalized_pagerank

    df = spark.createDataFrame(edges, "src long, dst long")
    nodes = sorted({n for e in edges for n in e})
    seeds = spark.createDataFrame([(nodes[0],)], "node long")
    out = personalized_pagerank(df, seeds, iterations=2).collect()
    total = sum(r["rank"] for r in out)
    assert total == __import__("pytest").approx(1.0, abs=1e-9)
    assert all(r["rank"] >= 0 for r in out)


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2"]),
            st.integers(min_value=0, max_value=10_000),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_gini_bounded_and_zero_on_constant(spark, rows):
    """Gini stays in [0, 1) for non-negative data; exactly 0 for a
    constant positive column."""
    from pyspark.sql import functions as F

    from datacamp_etl_spark.operators.profile import gini_by_group

    df = spark.createDataFrame(
        [(g, i, v) for i, (g, v) in enumerate(rows)],
        "g string, id long, v long",
    )
    for r in gini_by_group(df, "g", "v", "id").collect():
        if r["gini"] is not None:
            assert -1e-9 <= r["gini"] < 1.0
    const = df.withColumn("v", F.lit(7))
    for r in gini_by_group(const, "g", "v", "id").collect():
        assert r["gini"] == 0.0


@given(
    gaps=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=2,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_burstiness_bounded(spark, gaps):
    """B = (sigma-mu)/(sigma+mu) lies in [-1, 1) whenever defined
    (non-negative gaps -> sigma < ... bounded by mu relations)."""
    from pyspark.sql import functions as F

    from datacamp_etl_spark.operators.timeseries import (
        interarrival_burstiness,
    )

    ts = [0]
    for g in gaps:
        ts.append(ts[-1] + g)
    rows = [(1, t) for t in ts]
    df = spark.createDataFrame(rows, "user_id long, sec long").select(
        "user_id",
        F.timestamp_seconds(F.col("sec")).alias("ts"),
        F.col("sec").alias("event_id"),
    )
    out = interarrival_burstiness(
        df, "ts", "user_id", order_col="event_id", min_events=2
    ).collect()
    for r in out:
        if r["burstiness"] is not None:
            assert -1.0 - 1e-9 <= r["burstiness"] <= 1.0


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # basket
            st.sampled_from(["a", "b", "c", "d"]),   # item
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(**SETTINGS)
def test_basket_lift_identities(spark, rows):
    """Association-rule identities on any basket set: support <=
    confidence, n_pair bounded by each item's basket count, and
    lift * n_a * n_b == N * n_pair (exactly, from the counts)."""
    from datacamp_etl_spark.operators.basket import basket_pair_lift

    df = spark.createDataFrame(rows, "b long, i string")
    items = {(b, i) for b, i in rows}
    n_baskets = len({b for b, _ in items})
    counts = {}
    for _b, i in items:
        counts[i] = counts.get(i, 0) + 1
    out = basket_pair_lift(df, "b", "i", min_pair_count=1).collect()
    for r in out:
        na, nb = counts[r["item_a"]], counts[r["item_b"]]
        assert r["n_pair"] <= min(na, nb)
        assert r["support"] <= r["confidence_ab"] + 1e-9
        expected_lift = n_baskets * r["n_pair"] / (na * nb)
        assert r["lift"] == __import__("pytest").approx(
            round(expected_lift, 6), abs=2e-6
        )


@given(
    vals=st.lists(
        st.integers(min_value=-1000, max_value=1000),
        min_size=1,
        max_size=14,
    )
)
@settings(**SETTINGS)
def test_seasonal_decompose_identity(spark, vals):
    """total == grand + seasonal + residual on every day, for any
    daily series (the additive-decomposition invariant)."""
    from pyspark.sql import functions as F

    from datacamp_etl_spark.operators.timeseries import seasonal_decompose

    rows = [
        ("g", f"1970-01-{d:02d} 06:00:00", float(v))
        for d, v in enumerate(vals, start=1)
    ]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = seasonal_decompose(df, "ts", "v", "g").collect()
    n = len(out)
    grand = sum(r["total"] for r in out) / n
    for r in out:
        assert r["total"] == __import__("pytest").approx(
            grand + r["seasonal"] + r["residual"], abs=1e-4
        )
