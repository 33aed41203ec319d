"""Round-10 operators: hashed-feature logistic quality scorer
(classify.logistic_train / logistic_score)."""

from __future__ import annotations

import hashlib
import math
import os

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.classify import (
    FIXTURE_LOGISTIC_V1,
    LOGISTIC_SCALE,
    hashed_presence_features,
    logistic_score,
    logistic_train,
)


def _py_bucket(tok: str, n_buckets: int) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % n_buckets


def _py_train(rows, n_buckets, n_iter, lr_num, lr_den):
    """Pure-Python replica of the fixed-point GD (the closed-form
    ground truth the distributed trainer must match exactly)."""
    feats = [
        {_py_bucket(t, n_buckets) for t in text.lower().split()}
        for text, _y in rows
    ]
    ys = [y for _t, y in rows]
    w = [0] * n_buckets
    b = 0
    n = len(rows)
    for _ in range(n_iter):
        grad = [0] * n_buckets
        gb = 0
        for fs, y in zip(feats, ys):
            m = b + sum(w[j] for j in fs)
            p = 1.0 / (1.0 + math.exp(-m / LOGISTIC_SCALE))
            e = math.floor(p * LOGISTIC_SCALE + 0.5) - y * LOGISTIC_SCALE
            gb += e
            for j in fs:
                grad[j] += e
        den = lr_den * n
        for j in range(n_buckets):
            w[j] -= (lr_num * grad[j]) // den
        b -= (lr_num * gb) // den
    return w, b


def test_logistic_train_matches_python_replica_exactly(spark):
    rows = [
        ("good clean prose with structure", 1),
        ("good solid text body here", 1),
        ("spam spam junk junk", 0),
        ("junk noise garbage spam", 0),
        ("clean structure prose good words", 1),
        ("garbage noise", 0),
    ]
    df = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(rows)],
        "doc_id long, text string, y int",
    )
    m = logistic_train(
        df, F.col("y"), n_buckets=32, n_iter=4, lr_num=1, lr_den=2
    )
    w, b = _py_train(rows, 32, 4, 1, 2)
    assert m["weights"] == w and m["bias"] == b


def test_logistic_converges_on_separable_data(spark):
    # closed-form expectation: with 'good' only in positives and
    # 'spam' only in negatives, GD must push their bucket weights to
    # opposite signs and classify the training set perfectly
    pos = [(i, f"good text number {i}", 1) for i in range(10)]
    neg = [(100 + i, f"spam junk number {i}", 0) for i in range(10)]
    df = spark.createDataFrame(
        pos + neg, "doc_id long, text string, y int"
    )
    m = logistic_train(
        df, F.col("y"), n_buckets=64, n_iter=15, lr_num=1, lr_den=2
    )
    w = m["weights"]
    assert w[_py_bucket("good", 64)] > 0 > w[_py_bucket("spam", 64)]
    sc = logistic_score(df, w, m["bias"])
    got = {r["doc_id"]: r["predicted"] for r in sc.collect()}
    assert all(got[i] for i, _t, _y in pos)
    assert not any(got[i] for i, _t, _y in neg)


def test_logistic_presence_not_count_semantics(spark):
    # repeating a token must not change the margin (presence bits)
    df = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha alpha beta beta")],
        "doc_id long, text string",
    )
    w = [1000] * 16
    out = {r["doc_id"]: r for r in logistic_score(df, w, 5).collect()}
    assert out[1]["margin_micros"] == out[2]["margin_micros"]
    assert out[1]["n_features"] == out[2]["n_features"]


def test_logistic_empty_doc_scores_bias_only(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "tok")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in logistic_score(df, [7] * 8, -3).collect()
    }
    assert out[1]["margin_micros"] == -3 and out[1]["n_features"] == 0
    assert out[2]["margin_micros"] == -3
    assert out[3]["margin_micros"] == 4  # bias + one present bucket


def test_hashed_features_bounded_per_doc(spark):
    long_doc = " ".join(f"tok{i}" for i in range(500))
    df = spark.createDataFrame([(1, long_doc)], "doc_id long, text string")
    n = hashed_presence_features(df, n_buckets=16).count()
    assert n <= 16  # presence rows bounded by n_buckets, not doc length


def test_logistic_fixture_rederives(spark):
    """FIXTURE_LOGISTIC_V1 == logistic_train on sf0.001 with Gopher
    weak labels (guards fixture rot, same pattern as the tokenizer
    fixtures)."""
    from datacamp_etl_spark.operators.quality import gopher_rules

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lab = docs.join(gopher_rules(docs).select("doc_id", "keep"), "doc_id")
    m = logistic_train(
        lab, F.col("keep"), n_buckets=64, n_iter=20, lr_num=1, lr_den=4
    )
    assert m["weights"] == FIXTURE_LOGISTIC_V1["weights"]
    assert m["bias"] == FIXTURE_LOGISTIC_V1["bias"]


def test_logistic_fixture_beats_majority_baseline(spark):
    from datacamp_etl_spark.operators.quality import gopher_rules

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lab = gopher_rules(docs).select("doc_id", "keep")
    sc = logistic_score(
        docs, FIXTURE_LOGISTIC_V1["weights"], FIXTURE_LOGISTIC_V1["bias"]
    )
    j = sc.join(lab, "doc_id")
    n = j.count()
    acc = j.where(F.col("predicted") == (F.col("keep") == 1)).count() / n
    keep_rate = lab.where("keep = 1").count() / n
    majority = max(keep_rate, 1 - keep_rate)
    assert acc > majority + 0.05  # genuinely learned, not degenerate


# ---------------------------------------------------------------------
# mixture.epoch_plan
# ---------------------------------------------------------------------


def test_epoch_plan_exact_integer_math(spark):
    from datacamp_etl_spark.operators.mixture import epoch_plan

    # src a: 2 docs x 4 tokens = 8; src b: 1 doc x 2 tokens
    df = spark.createDataFrame(
        [
            (1, "a", "t1 t2 t3 t4"),
            (2, "a", "t1 t2 t3 t4"),
            (3, "b", "t1 t2"),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["source"]: r
        for r in epoch_plan(
            df, {"a": 750_000, "b": 250_000}, 100, epoch_cap_milli=4000
        ).collect()
    }
    a, b = out["a"], out["b"]
    assert (a["n_docs"], a["n_tokens"]) == (2, 8)
    assert a["target_tokens"] == 75  # 100 * 750k // 1e6
    assert a["epochs_milli"] == (75 * 1000) // 8  # 9375
    assert a["capped_epochs_milli"] == 4000  # capped
    assert a["achievable_tokens"] == (4000 * 8) // 1000  # 32
    assert a["shortfall_tokens"] == 75 - 32
    assert b["target_tokens"] == 25
    assert b["epochs_milli"] == 12_500 and b["capped_epochs_milli"] == 4000
    assert b["achievable_tokens"] == 8 and b["shortfall_tokens"] == 17


def test_epoch_plan_under_budget_no_cap(spark):
    from datacamp_etl_spark.operators.mixture import epoch_plan

    df = spark.createDataFrame(
        [(1, "a", "x " * 50), (2, "b", "x " * 50)],
        "doc_id long, source string, text string",
    )
    out = {
        r["source"]: r
        for r in epoch_plan(
            df, {"a": 500_000, "b": 500_000}, 60, epoch_cap_milli=4000
        ).collect()
    }
    # each target 30 tokens over 50 available -> 0.6 epochs, no cap,
    # no shortfall beyond integer floor
    assert out["a"]["epochs_milli"] == 600
    assert out["a"]["capped_epochs_milli"] == 600
    assert out["a"]["achievable_tokens"] == 30
    assert out["a"]["shortfall_tokens"] == 0


def test_epoch_plan_unweighted_source_planned_out(spark):
    from datacamp_etl_spark.operators.mixture import epoch_plan

    df = spark.createDataFrame(
        [(1, "a", "x y"), (2, "zzz", "x y")],
        "doc_id long, source string, text string",
    )
    out = {
        r["source"]: r
        for r in epoch_plan(df, {"a": 1_000_000}, 100).collect()
    }
    assert out["zzz"]["weight_ppm"] == 0
    assert out["zzz"]["target_tokens"] == 0
    assert out["zzz"]["achievable_tokens"] == 0


def test_epoch_plan_rejects_bad_args(spark):
    import pytest as _pytest

    from datacamp_etl_spark.operators.mixture import epoch_plan

    df = spark.createDataFrame([(1, "a", "x")], "doc_id long, source string, text string")
    with _pytest.raises(ValueError):
        epoch_plan(df, {}, 100)
    with _pytest.raises(ValueError):
        epoch_plan(df, {"a": 1}, -1)
    # exactly one of weights_ppm / weights_expr
    with _pytest.raises(ValueError, match="exactly one"):
        epoch_plan(df, None, 100)
    with _pytest.raises(ValueError, match="exactly one"):
        epoch_plan(df, {"a": 1}, 100, weights_expr=F.lit(1))


def test_epoch_plan_weights_expr_matches_dict_path(spark):
    from datacamp_etl_spark.operators.mixture import epoch_plan

    df = spark.createDataFrame(
        [
            (1, "a", "t1 t2 t3 t4"),
            (2, "a", "t1 t2 t3 t4"),
            (3, "b", "t1 t2"),
        ],
        "doc_id long, source string, text string",
    )
    # same weights expressed as a plan-side rule: a=750k, b=250k
    expr = F.when(F.col("source") == "a", 750_000).otherwise(250_000)
    via_dict = sorted(
        map(tuple, epoch_plan(
            df, {"a": 750_000, "b": 250_000}, 100, epoch_cap_milli=4000
        ).collect())
    )
    via_expr = sorted(
        map(tuple, epoch_plan(
            df, None, 100, weights_expr=expr, epoch_cap_milli=4000
        ).collect())
    )
    assert via_dict == via_expr


def test_epoch_plan_weights_expr_zero_total_raises_lazily(spark):
    import pytest as _pytest

    from datacamp_etl_spark.operators.mixture import epoch_plan

    df = spark.createDataFrame(
        [(1, "a", "x")], "doc_id long, source string, text string"
    )
    # plan construction succeeds (lazy guard); the action raises
    q = epoch_plan(df, None, 100, weights_expr=F.lit(0))
    with _pytest.raises(Exception, match="positive total"):
        q.collect()


# ---------------------------------------------------------------------
# ids.global_running_sum / layout.shard_assignments / training shards
# ---------------------------------------------------------------------


def test_global_running_sum_matches_single_partition_window(spark):
    from pyspark.sql import Window

    from datacamp_etl_spark.operators.ids import global_running_sum

    df = spark.range(1000).select(
        F.col("id").alias("k"), ((F.col("id") * 7) % 13 + 1).alias("w")
    )
    got = {
        r["k"]: r["__running"]
        for r in global_running_sum(
            df, ["k"], "w", num_partitions=8
        ).collect()
    }
    want = {
        r["k"]: r["run"]
        for r in df.withColumn(
            "run",
            F.sum("w").over(
                Window.orderBy("k").rowsBetween(
                    Window.unboundedPreceding, Window.currentRow
                )
            ),
        ).collect()
    }
    assert got == want


def test_global_running_sum_plans_no_global_window(spark):
    from datacamp_etl_spark.operators.ids import global_running_sum

    df = spark.range(100).select(
        F.col("id").alias("k"), F.lit(1).alias("w")
    )
    out = global_running_sum(df, ["k"], "w", num_partitions=4)
    phys = out._jdf.queryExecution().executedPlan().toString()
    # every Window in the plan is partitioned by __pid (3 bracket
    # groups, see test_plan_audit.global_window_lines contract)
    import test_plan_audit as tpa

    assert tpa.global_window_lines(phys) == []


def test_shard_assignments_boundaries_and_balance(spark):
    from datacamp_etl_spark.sources.layout import shard_assignments

    df = spark.createDataFrame(
        [(i, 10) for i in range(100)], "doc_id long, n long"
    )
    rows = shard_assignments(df, "n", 25).collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    # a doc belongs to the shard its running total STARTS in, so a
    # doc's tail can cover the next shard's opening span — every
    # non-final shard's total is within one doc of the budget
    totals = {s: sum(r["n"] for r in v) for s, v in by_shard.items()}
    for s, tot in totals.items():
        if s != max(totals):
            assert 25 - 9 <= tot <= 25 + 9
    assert sum(totals.values()) == 1000
    # shards are contiguous 0..max
    assert sorted(by_shard) == list(range(len(by_shard)))


def test_write_training_shards_layout_and_manifest(spark, tmp_path):
    from datacamp_etl_spark.sources.layout import write_training_shards

    df = spark.createDataFrame(
        [(i, f"t{i}", 7 + i % 5) for i in range(200)],
        "doc_id long, text string, n long",
    )
    path = str(tmp_path / "shards")
    manifest = write_training_shards(df, path, "n", 100).collect()
    # every doc lands in exactly one shard partition dir
    back = spark.read.parquet(f"{path}/shards")
    assert back.count() == 200
    assert back.select("doc_id").distinct().count() == 200
    dirs = {
        d for d in os.listdir(f"{path}/shards") if d.startswith("shard=")
    }
    assert len(dirs) == len(manifest)
    # manifest pins membership: per-shard recount matches
    got = {
        r["shard"]: (r["n_docs"], r["n_tokens"]) for r in manifest
    }
    re_m = {
        r["shard"]: (r["cnt"], r["tok"])
        for r in back.groupBy("shard")
        .agg(F.count("*").alias("cnt"), F.sum("n").alias("tok"))
        .collect()
    }
    assert got == re_m
    # persisted manifest parquet round-trips
    persisted = spark.read.parquet(f"{path}/manifest")
    assert persisted.count() == len(manifest)


# ---------------------------------------------------------------------
# funnel.attribution_last_touch / profile.score_calibration
# ---------------------------------------------------------------------


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )


def test_attribution_credits_most_recent_touch_in_window(spark):
    import datetime as dt

    from datacamp_etl_spark.operators.funnel import (
        attribution_last_touch,
    )

    t0 = dt.datetime(2024, 1, 1)

    def at(h):
        return t0 + dt.timedelta(hours=h)

    rows = [
        # user 1: click then NEWER view -> view credited
        (1, 1, "click", at(0)), (2, 1, "view", at(1)),
        (3, 1, "purchase", at(2)),
        # user 2: touch 30h before purchase -> outside 24h -> direct
        (4, 2, "click", at(0)), (5, 2, "purchase", at(30)),
        # user 3: no touches at all -> direct
        (6, 3, "purchase", at(5)),
        # user 4: touch AFTER the purchase must not count
        (7, 4, "purchase", at(1)), (8, 4, "click", at(2)),
    ]
    out = {
        r["channel"]: r["n_conversions"]
        for r in attribution_last_touch(
            _events(spark, rows), "purchase", ["click", "view"]
        ).collect()
    }
    assert out == {"view": 1, "direct": 3}


def test_attribution_rejects_conversion_as_touch(spark):
    import pytest as _pytest

    from datacamp_etl_spark.operators.funnel import (
        attribution_last_touch,
    )

    with _pytest.raises(ValueError):
        attribution_last_touch(
            _events(spark, []), "click", ["click", "view"]
        )


def test_score_calibration_perfect_scorer(spark):
    from datacamp_etl_spark.operators.profile import score_calibration

    # scores == labels*100: bottom bins all-negative, top all-positive
    rows = [(i, i, 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, s long, y int")
    out = {
        r["bin"]: r
        for r in score_calibration(df, "s", "y", "doc_id", bins=10)
        .collect()
    }
    assert len(out) == 10 and all(out[b]["n"] == 10 for b in out)
    for b in range(1, 6):
        assert out[b]["pos_ppm"] == 0
    for b in range(6, 11):
        assert out[b]["pos_ppm"] == 1_000_000
    assert out[1]["min_score"] == 0 and out[10]["max_score"] == 99


def test_score_calibration_ansi_remainder_bins(spark):
    from datacamp_etl_spark.operators.profile import score_calibration

    # 7 rows into 3 bins: ANSI ntile sizes 3,2,2 (remainder first)
    rows = [(i, i, 0) for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, s long, y int")
    sizes = {
        r["bin"]: r["n"]
        for r in score_calibration(df, "s", "y", "doc_id", bins=3)
        .collect()
    }
    assert sizes == {1: 3, 2: 2, 3: 2}
