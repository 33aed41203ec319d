"""Sketch aggregates: accuracy bounds + the plan shapes that make
them 100 TB-safe (bounded state, no data-sized shuffle on probe)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacamp_etl_spark import plans
from datacamp_etl_spark.operators import sketch
from datacamp_etl_spark.queries import t
from tests.conftest import load


def test_kmv_exact_below_k(spark, sf_dir):
    """Fewer distinct values than k -> the sketch is exact."""
    ev = t(spark, sf_dir, "events")
    row = sketch.kmv_distinct(ev, "event_type", k=256).collect()[0]
    exact = ev.select("event_type").distinct().count()
    assert row["n_minima"] == exact
    assert row["est_distinct"] == exact


def test_kmv_estimate_within_bound(spark, sf_dir):
    """KMV relative error concentrates around 1/sqrt(k); assert a
    generous 5x that bound so the test is not flaky on small data."""
    orders = load(spark, sf_dir, "orders")
    k = 128
    row = sketch.kmv_distinct(orders, "o_orderkey", k=k).collect()[0]
    exact = orders.select("o_orderkey").distinct().count()
    assert exact > k, "fixture must exercise the sketch path"
    rel = abs(row["est_distinct"] - exact) / exact
    assert rel < 5 / (k ** 0.5), (row["est_distinct"], exact, rel)


def test_kmv_partition_invariant(spark, sf_dir):
    """The estimate must not depend on physical layout (the property
    that makes the merge associative across 1000 executors)."""
    orders = load(spark, sf_dir, "orders")
    a = sketch.kmv_distinct(orders, "o_orderkey", k=64).collect()[0]
    b = sketch.kmv_distinct(orders.repartition(13), "o_orderkey", k=64).collect()[0]
    assert a == b


def test_kmv_grouped_matches_global_per_group(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    got = {
        r["event_type"]: r
        for r in sketch.kmv_distinct_by(ev, ["event_type"], "user_id", k=32).collect()
    }
    for etype, row in got.items():
        solo = sketch.kmv_distinct(
            ev.where(F.col("event_type") == etype), "user_id", k=32
        ).collect()[0]
        assert (row["n_minima"], row["kth_min"], row["est_distinct"]) == (
            solo["n_minima"], solo["kth_min"], solo["est_distinct"],
        ), etype


def test_cm_overestimates_never_under(spark, sf_dir):
    """CM guarantees est >= true count; with width >> #items it is
    exact on this fixture."""
    ev = t(spark, sf_dir, "events")
    sk = sketch.cm_sketch(ev, "event_type", depth=4, width=1024)
    items = ev.select("event_type").distinct()
    est = {
        r["event_type"]: r["est_count"]
        for r in sketch.cm_estimate_counts(sk, items, "event_type", width=1024).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for etype, n in exact.items():
        assert est[etype] >= n, (etype, est[etype], n)
        assert est[etype] <= int(n * 1.5) + 50, (etype, est[etype], n)


def test_cm_sketch_is_bounded(spark, sf_dir):
    """The counts table can never exceed depth*width rows — the sketch
    is O(1) in the input size."""
    ev = t(spark, sf_dir, "events")
    assert sketch.cm_sketch(ev, "user_id", depth=3, width=64).count() <= 3 * 64


def test_cm_probe_broadcasts_sketch(spark, sf_dir):
    """Probing must broadcast the tiny sketch, not shuffle the probe
    side: at 100 TB the probe set may be the whole corpus."""
    ev = t(spark, sf_dir, "events")
    sk = sketch.cm_sketch(ev, "event_type")
    items = ev.select("event_type").distinct()
    df = sketch.cm_estimate_counts(sk, items, "event_type")
    plans.assert_broadcast_join(df, at_least=1)
    plans.assert_no_cartesian(df)


def test_approx_distinct_tolerance(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    est = sketch.approx_distinct(orders, "o_orderkey", rsd=0.02).collect()[0][0]
    exact = orders.select("o_orderkey").distinct().count()
    assert abs(est - exact) / exact < 0.1, (est, exact)


def test_approx_quantiles_ordered_and_bounded(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    qs = sketch.approx_quantiles(li, "l_quantity", [0.1, 0.5, 0.9])
    assert qs == sorted(qs)
    lo, hi = li.agg(F.min("l_quantity"), F.max("l_quantity")).collect()[0]
    assert lo <= qs[0] and qs[-1] <= hi


def test_hll_incremental_merge_tracks_exact_within_tolerance(spark):
    from datacamp_etl_spark.operators import sketch as S

    df = spark.range(30000).selectExpr(
        "id % 4 AS g", "CAST(id % 9001 AS STRING) AS v"
    )
    a, b = df.where("id < 11000"), df.where("id >= 11000")
    state = S.hll_merge(
        S.hll_state(a, ["g"], "v"), S.hll_state(b, ["g"], "v"), ["g"], "v"
    )
    est = {r["g"]: r["n_distinct_v"] for r in S.hll_estimate(state, "v").collect()}
    exact = {
        r["g"]: r["n"]
        for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
    }
    for g in exact:
        assert abs(est[g] - exact[g]) / exact[g] < 0.02, (g, est[g], exact[g])


def test_hll_merge_is_idempotent(spark):
    """Re-merging the same delta must not move the estimate — the
    property that makes sketch state safe under batch replays (where
    additive counts need a ledger)."""
    from datacamp_etl_spark.operators import sketch as S

    df = spark.range(5000).selectExpr("id % 2 AS g", "CAST(id AS STRING) AS v")
    st = S.hll_state(df, ["g"], "v")
    once = S.hll_merge(st, st, ["g"], "v")
    twice = S.hll_merge(once, st, ["g"], "v")
    e1 = {r["g"]: r["n_distinct_v"] for r in S.hll_estimate(once, "v").collect()}
    e2 = {r["g"]: r["n_distinct_v"] for r in S.hll_estimate(twice, "v").collect()}
    assert e1 == e2
