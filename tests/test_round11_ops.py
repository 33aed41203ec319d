"""Round-11 regression tests for the ADVICE r10 findings: the PPR
oracle restart-constant parity + seed-conservation guard (graph.py /
queries.py), the churn midpoint's exact floor division (funnel.py),
the position-based attribution direct anti-join keyed per user
(funnel.py), and gini_by_group's integral-value contract + fixed-point
scale (profile.py).

Every assertion is against a hand-computed ground truth on a fixture
small enough to verify on paper."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _ev(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_type string, value double"
    )
    return df.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        "event_type",
        "value",
        F.monotonically_increasing_id().alias("event_id"),
    )


# ------------------------------------------------ personalized PageRank

def test_ppr_seed_not_endpoint_raises(spark):
    # A seed absent from the edge set would silently leak 1/|S| of
    # restart mass every round (ranks no longer sum to 1) — the
    # operator must refuse instead.
    from datacamp_etl_spark.operators.graph import personalized_pagerank

    e = _edges(spark, [(1, 2)])
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    with pytest.raises(ValueError, match="not edge endpoints"):
        personalized_pagerank(e, seeds, iterations=1)


def test_ppr_oracle_restart_constant_derived_not_literal():
    # Bit-replay contract: Spark computes F.lit(1.0 - 0.85), which is
    # NOT the same IEEE double as the literal 0.15 — the oracle must
    # derive the constant the same way (same convention as the plain
    # pagerank oracle).
    from datacamp_etl_spark.queries import ORACLE

    sql = ORACLE["personalized_pagerank"]
    assert "(1 - 0.85)" in sql
    assert "0.15" not in sql
    assert (1 - 0.85) != 0.15  # the two doubles really differ


# ------------------------------------------------------- churn midpoint

def test_churn_midpoint_exact_floor_past_2_53(spark):
    # min+max = 2^58 + 3 µs: the double path rounds the sum to 2^58
    # and yields midpoint 2^57, while exact floor((min+max)/2) is
    # 2^57 + 1. A user whose only event sits exactly at 2^57 + 1 is
    # EARLY under exact integer semantics (and was late under the
    # old double division).
    from datacamp_etl_spark.operators.funnel import churn_rates

    m1 = 2**57 - 100
    m2 = 2**58 + 3 - m1
    true_mid = (m1 + m2) >> 1  # 2^57 + 1
    assert int(float(m1 + m2) / 2.0) != true_mid  # old path diverges
    df = spark.createDataFrame(
        [(1, m1), (1, m2), (2, true_mid)], "user_id long, us long"
    ).select("user_id", F.timestamp_micros("us").alias("ts"))
    r = churn_rates(df).collect()[0]
    # user 1 spans both halves -> retained; user 2 at the exact
    # midpoint -> early-only -> churned
    assert (r["n_active_early"], r["n_retained"], r["n_churned"]) == (
        2,
        1,
        1,
    )


# ------------------------------- position-based attribution direct row

def test_attribution_direct_keyed_per_user_not_global_id(spark):
    # user 1's credited conversion and user 2's untouched conversion
    # share event_id=7 (ids only per-user-unique): user 2 must still
    # get direct credit — the anti-join keys on (user, id), not id.
    from datacamp_etl_spark.operators.funnel import (
        attribution_position_based,
    )

    rows = [
        (7, 1, "click", "1970-01-01 00:01:00"),
        (7, 1, "purchase", "1970-01-01 00:02:00"),
        (7, 2, "purchase", "1970-01-01 00:03:00"),
    ]
    # NOTE: build events directly so event_id collides across users
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).select(
        "event_id",
        "user_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
    )
    got = {
        r["channel"]: r["credit_ppm"]
        for r in attribution_position_based(
            df, "purchase", ["click", "view"]
        ).collect()
    }
    assert got["click"] == 1_000_000  # user 1's single-touch credit
    assert got["direct"] == 1_000_000  # user 2 NOT suppressed


# --------------------------------------------------- gini fixed-point

def test_gini_scale_matches_prescaled_integers(spark):
    from datacamp_etl_spark.operators.profile import gini_by_group

    frac = [("g", 0.01 * i, i) for i in range(1, 21)]
    df_f = spark.createDataFrame(frac, "grp string, v double, id long")
    df_i = spark.createDataFrame(
        [("g", round(v * 100), i) for (_, v, i) in frac],
        "grp string, v long, id long",
    )
    g_scaled = gini_by_group(df_f, "grp", "v", "id", scale=100).collect()[0]
    g_int = gini_by_group(df_i, "grp", "v", "id").collect()[0]
    assert g_scaled["gini"] == g_int["gini"]
    assert g_scaled["n_rows"] == 20


def test_gini_rejects_nonpositive_scale(spark):
    from datacamp_etl_spark.operators.profile import gini_by_group

    df = spark.createDataFrame([("g", 1, 1)], "grp string, v long, id long")
    with pytest.raises(ValueError, match="scale"):
        gini_by_group(df, "grp", "v", "id", scale=0)


def test_gini_default_scale_integral_passthrough(spark):
    from datacamp_etl_spark.operators.profile import gini_by_group

    # perfectly even integral distribution -> G = 0 exactly
    df = spark.createDataFrame(
        [("g", 5, i) for i in range(10)], "grp string, v long, id long"
    )
    assert gini_by_group(df, "grp", "v", "id").collect()[0]["gini"] == 0.0


# ------------------------------------------- linkage max_block_size

def test_blocked_pairs_mega_block_dropped(spark):
    from datacamp_etl_spark.operators.linkage import blocked_pairs

    rows = [(i, "BIG" if i <= 5 else "ok") for i in range(1, 8)]
    df = spark.createDataFrame(rows, "k long, blk string")
    # cap 4: the 5-record BIG block is dropped, the 2-record ok block
    # still pairs
    got = blocked_pairs(df, "k", "blk", max_block_size=4).collect()
    assert len(got) == 1
    assert (got[0]["k_a"], got[0]["k_b"]) == (6, 7)
    # uncapped: C(5,2) + C(2,2) = 10 + 1
    assert len(blocked_pairs(df, "k", "blk", max_block_size=None).collect()) == 11


def test_block_stats_reports_over_cap(spark):
    from datacamp_etl_spark.operators.linkage import block_stats

    rows = [(i, "BIG" if i <= 5 else "ok") for i in range(1, 8)]
    df = spark.createDataFrame(rows, "k long, blk string")
    got = {
        r["block"]: r for r in block_stats(df, "blk", max_block_size=4).collect()
    }
    assert got["BIG"]["n_records"] == 5 and got["BIG"]["n_pairs"] == 10
    assert bool(got["BIG"]["over_cap"]) is True
    assert got["ok"]["n_pairs"] == 1 and bool(got["ok"]["over_cap"]) is False


# --------------------------------------------- dhash mega-bucket cap

def test_dhash_near_pairs_bucket_cap(spark):
    from datacamp_etl_spark.operators.multimodal import dhash_near_pairs

    # 5 identical signatures (every band bucket holds 5) + 1 far one
    sig = spark.createDataFrame(
        [(i, 0) for i in range(1, 6)] + [(9, (1 << 56) - 1)],
        "media_id long, dhash long",
    )
    # cap 4: all shared buckets over cap -> no pairs at all
    assert dhash_near_pairs(sig, max_bucket_size=4).count() == 0
    # cap high enough: C(5,2) = 10 exact-dup pairs
    assert dhash_near_pairs(sig, max_bucket_size=10).count() == 10
    assert dhash_near_pairs(sig, max_bucket_size=None).count() == 10


# ----------------------------------------- anomaly_zscore fast path

def _series(spark, vals):
    return spark.createDataFrame(
        [(1, i, float(v)) for i, v in enumerate(vals)],
        "k long, i long, v double",
    )


def test_anomaly_zscore_bigint_matches_decimal(spark):
    from datacamp_etl_spark.operators.timeseries import anomaly_zscore

    vals = [10.0] * 10 + [10.5] + [10.0] * 5 + [99.0] + [10.0] * 4
    kw = dict(lookback=8, min_history=4, threshold=3)
    a = sorted(
        (r["i"], r["direction"])
        for r in anomaly_zscore(
            _series(spark, vals), "k", ["i"], "v", **kw
        ).collect()
    )
    b = sorted(
        (r["i"], r["direction"])
        for r in anomaly_zscore(
            _series(spark, vals), "k", ["i"], "v",
            accumulator="bigint", **kw
        ).collect()
    )
    assert a == b and len(a) >= 1


def test_anomaly_zscore_bigint_out_of_bound_raises(spark):
    from datacamp_etl_spark.operators.timeseries import anomaly_zscore

    # |v*scale| = 1e17 is beyond the int64-safe bound for lookback=20.
    # The bound is enforced LAZILY (a raise_error guard inside the
    # plan — no eager probe job), so the failure surfaces at the
    # first action as a Spark runtime exception.
    df = _series(spark, [1e15] * 30)
    q = anomaly_zscore(df, "k", ["i"], "v", accumulator="bigint")
    with pytest.raises(Exception, match="int64-safe bound"):
        q.collect()


def test_anomaly_zscore_rejects_unknown_accumulator(spark):
    from datacamp_etl_spark.operators.timeseries import anomaly_zscore

    with pytest.raises(ValueError, match="accumulator"):
        anomaly_zscore(
            _series(spark, [1.0]), "k", ["i"], "v", accumulator="float"
        )


# --------------------------------------- band-index append + staleness

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_band_index_append_and_stats_hand_case(spark):
    from datacamp_etl_spark.operators.dedup import (
        band_index_append,
        band_index_stats,
        band_signatures,
    )

    corpus = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),
            (2, "epsilon zeta eta theta"),
            (3, "iota kappa lambda mu"),
        ],
    )
    batch = _docs(
        spark,
        [
            (4, "alpha beta gamma delta"),  # exact dup of doc 1
            (5, "nu xi omicron pi"),
        ],
    )
    idx = band_index_append(band_signatures(corpus), batch)
    got = {r["band"]: r for r in band_index_stats(idx).collect()}
    assert sorted(got) == [0, 1, 2, 3]
    for r in got.values():
        assert (r["n_base"], r["n_appended"], r["n_total"]) == (3, 2, 5)
        # 5 postings over a 20-posting index -> exactly 250000 ppm
        assert r["share_ppm"] == 250_000
        # doc 4 shares doc 1's signature -> 4 buckets, largest holds 2
        assert r["n_buckets"] == 4 and r["max_bucket"] == 2
        assert r["n_over_cap"] == 0


def test_band_index_stats_no_generation_is_all_base(spark):
    from datacamp_etl_spark.operators.dedup import (
        band_index_stats,
        band_signatures,
    )

    idx = band_signatures(
        _docs(spark, [(1, "alpha beta gamma delta")])
    )
    for r in band_index_stats(idx).collect():
        assert r["n_appended"] == 0 and r["n_base"] == r["n_total"]


def test_band_index_stats_over_cap_counted(spark):
    from datacamp_etl_spark.operators.dedup import band_index_stats

    # hand-built index: band 0 has one bucket of 3 postings
    idx = spark.createDataFrame(
        [(i, 0, "sig_x") for i in range(3)] + [(9, 0, "sig_y")],
        "doc_id long, band int, band_sig string",
    )
    r = band_index_stats(idx, max_bucket_size=2).collect()[0]
    assert r["n_over_cap"] == 1 and r["max_bucket"] == 3


def test_band_index_append_feeds_incremental_dedup(spark):
    from datacamp_etl_spark.operators.dedup import (
        band_index_append,
        band_signatures,
        incremental_dedup,
    )

    corpus = _docs(spark, [(1, "alpha beta gamma delta")])
    gen1 = _docs(spark, [(2, "nu xi omicron pi")])
    idx = band_index_append(band_signatures(corpus), gen1)
    # a later batch duplicating the APPENDED doc must be caught
    batch = _docs(
        spark,
        [(10, "nu xi omicron pi"), (11, "rho sigma tau upsilon")],
    )
    survivors = {
        r["doc_id"]
        for r in incremental_dedup(
            batch, idx.select("doc_id", "band", "band_sig")
        ).collect()
    }
    assert survivors == {11}


# ------------------------------------------- streaming image gate

def _media_ids(spark, ids):
    from datacamp_etl_spark.operators.multimodal import synthetic_bmp_media

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    return synthetic_bmp_media(df)


def test_image_gate_batch_drops_and_passes(spark):
    from datacamp_etl_spark.operators.multimodal import (
        image_dhash,
        streaming_image_near_dup_filter,
    )

    # id 3201 is class 1 flip 1 == id 1's exact image; id 2 is another
    # class (dHash far). Index holds id 1 only.
    idx = image_dhash(_media_ids(spark, [1]))
    stream = _media_ids(spark, [3201, 2])
    got = {
        r["media_id"]
        for r in streaming_image_near_dup_filter(stream, idx).collect()
    }
    assert got == {2}


def test_image_gate_non_image_rows_pass(spark):
    from datacamp_etl_spark.operators.multimodal import (
        image_dhash,
        streaming_image_near_dup_filter,
    )

    idx = image_dhash(_media_ids(spark, [1]))
    other = spark.createDataFrame(
        [(77, "video", None, None)],
        "media_id long, kind string, mime string, content binary",
    )
    stream = _media_ids(spark, [2]).unionByName(other)
    got = {
        r["media_id"]: r["dhash"]
        for r in streaming_image_near_dup_filter(stream, idx).collect()
    }
    assert set(got) == {2, 77} and got[77] is None


def test_image_gate_mega_bucket_cap(spark):
    from datacamp_etl_spark.operators.multimodal import (
        image_dhash,
        streaming_image_near_dup_filter,
    )

    sig1 = image_dhash(_media_ids(spark, [1])).collect()[0]["dhash"]
    idx = spark.createDataFrame(
        [(10, sig1), (11, sig1), (12, sig1)], "media_id long, dhash long"
    )
    stream = _media_ids(spark, [3201])  # identical image to id 1
    # default cap: every band bucket (3 sigs) under cap -> dropped
    assert (
        streaming_image_near_dup_filter(stream, idx).count() == 0
    )
    # cap 2: all buckets over cap -> gate has no index left -> passes
    assert (
        streaming_image_near_dup_filter(
            stream, idx, max_bucket_size=2
        ).count()
        == 1
    )


def test_image_gate_rejects_bad_banding(spark):
    from datacamp_etl_spark.operators.multimodal import (
        streaming_image_near_dup_filter,
    )

    idx = spark.createDataFrame([], "media_id long, dhash long")
    with pytest.raises(ValueError, match="divide"):
        streaming_image_near_dup_filter(
            _media_ids(spark, [1]), idx, bands=5
        )
    with pytest.raises(ValueError, match="pigeonhole"):
        streaming_image_near_dup_filter(
            _media_ids(spark, [1]), idx, max_hamming=7, bands=7
        )
