"""Round-10b operators: triangle counting / clustering coefficient /
common-neighbor link prediction (graph.py), Fellegi–Sunter linkage
(linkage.py), seasonal decomposition (timeseries.py), positional
phrase search (retrieval.py), readability (quality.py).

Every assertion is against a hand-computed ground truth on a fixture
small enough to verify on paper."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datacamp_etl_spark.operators.graph import (
    clustering_coefficient,
    common_neighbor_pairs,
    degrees,
    triangle_counts,
)
from datacamp_etl_spark.operators.linkage import (
    FieldComparator,
    blocked_pairs,
    fs_score_pairs,
)
from datacamp_etl_spark.operators.quality import readability_scores
from datacamp_etl_spark.operators.retrieval import phrase_match
from datacamp_etl_spark.operators.timeseries import seasonal_decompose


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


# ---------------------------------------------------------------- graph

def test_triangle_counts_k4(spark):
    # K4: every one of the 4 triangles touches 3 of the 4 nodes ->
    # each node is in C(3,2) = 3 triangles
    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, k4)).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_triangle_free_and_dupes(spark):
    # path graph, duplicate + reversed + self-loop edges must not count
    e = [(1, 2), (2, 1), (2, 3), (2, 3), (3, 4), (4, 4)]
    got = {
        r["node"]: r["n_triangles"]
        for r in triangle_counts(_edges(spark, e)).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 0}


def test_clustering_coefficient_paper_case(spark):
    # triangle 1-2-3 plus pendant 3-4:
    # deg = {1:2, 2:2, 3:3, 4:1}; T = {1:1, 2:1, 3:1, 4:0}
    # coeff(3) = 2*1/(3*2) = 0.333333; coeff(4) = 0 (deg < 2)
    e = [(1, 2), (2, 3), (1, 3), (3, 4)]
    rows = {
        r["node"]: r for r in clustering_coefficient(_edges(spark, e)).collect()
    }
    assert rows[1]["coeff"] == 1.0 and rows[1]["deg"] == 2
    assert rows[3]["coeff"] == pytest.approx(0.333333)
    assert rows[4]["coeff"] == 0.0 and rows[4]["n_triangles"] == 0


def test_degrees(spark):
    e = [(1, 2), (2, 3), (2, 3), (3, 2)]  # dupes collapse
    got = {r["node"]: r["deg"] for r in degrees(_edges(spark, e)).collect()}
    assert got == {1: 1, 2: 2, 3: 1}


def test_common_neighbor_pairs_jaccard(spark):
    # star 0-{1,2,3} plus edge 1-2:
    # N(1)={0,2}, N(2)={0,1}, N(3)={0}
    # pair (1,2): common={0} -> 1/(2+2-1) = 1/3
    # pair (1,3): common={0} -> 1/(2+1-1) = 1/2 ; (2,3) likewise
    # pair (0,2) via center 1: N(0)={1,2,3}, N(2)={0,1} common={1} -> 1/4
    e = [(0, 1), (0, 2), (0, 3), (1, 2)]
    rows = {
        (r["node_a"], r["node_b"]): r
        for r in common_neighbor_pairs(_edges(spark, e)).collect()
    }
    assert rows[(1, 2)]["common"] == 1
    assert rows[(1, 2)]["jaccard"] == pytest.approx(0.333333)
    assert rows[(1, 3)]["jaccard"] == pytest.approx(0.5)
    assert rows[(0, 2)]["jaccard"] == pytest.approx(0.25)


def test_common_neighbor_hub_cap(spark):
    # capping the center degree drops pairs generated THROUGH the hub
    e = [(0, 1), (0, 2), (0, 3), (1, 2)]
    capped = common_neighbor_pairs(_edges(spark, e), max_center_degree=2)
    got = {(r["node_a"], r["node_b"]) for r in capped.collect()}
    # hub 0 (deg 3) no longer generates (1,2)/(1,3)/(2,3); centers 1
    # and 2 (deg 2) still generate (0,2) and (0,1)
    assert (1, 3) not in got and (2, 3) not in got
    assert (0, 2) in got and (0, 1) in got


# -------------------------------------------------------------- linkage

def test_blocked_pairs_and_fs_scores(spark):
    df = spark.createDataFrame(
        [
            (1, "ann", "b1", 10.0),
            (2, "ann", "b1", 50.0),
            (3, "bob", "b1", 500.0),
            (4, "ann", "b2", 10.0),  # other block: never paired with 1-3
        ],
        "id long, name string, blk string, bal double",
    )
    pairs = blocked_pairs(df, "id", "blk")
    assert pairs.count() == 3  # C(3,2) within b1
    scored = fs_score_pairs(
        pairs,
        [
            FieldComparator(
                "name", F.col("name_a") == F.col("name_b"), "3.0", "-1.0"
            ),
            FieldComparator(
                "bal",
                F.abs(F.col("bal_a") - F.col("bal_b")) <= 100.0,
                "2.0",
                "-2.0",
            ),
        ],
        match_threshold="5.0",
        non_match_threshold="0.0",
    )
    rows = {
        (r["id_a"], r["id_b"]): r for r in scored.collect()
    }
    # (1,2): name agree + bal agree -> 5.0 match
    assert float(rows[(1, 2)]["score"]) == 5.0
    assert rows[(1, 2)]["decision"] == "match"
    # (1,3): both disagree -> -3.0 non_match
    assert float(rows[(1, 3)]["score"]) == -3.0
    assert rows[(1, 3)]["decision"] == "non_match"
    assert rows[(1, 3)]["name_agree"] == 0
    # (2,3): name disagree, bal disagree (450 gap) -> -3.0
    assert rows[(2, 3)]["decision"] == "non_match"


def test_fs_possible_band(spark):
    df = spark.createDataFrame(
        [(1, "x", "b", 0.0), (2, "x", "b", 400.0)],
        "id long, name string, blk string, bal double",
    )
    scored = fs_score_pairs(
        blocked_pairs(df, "id", "blk"),
        [
            FieldComparator(
                "name", F.col("name_a") == F.col("name_b"), "3.0", "-1.0"
            ),
            FieldComparator(
                "bal",
                F.abs(F.col("bal_a") - F.col("bal_b")) <= 100.0,
                "2.0",
                "-2.0",
            ),
        ],
        match_threshold="5.0",
        non_match_threshold="0.0",
    )
    r = scored.collect()[0]
    assert float(r["score"]) == 1.0 and r["decision"] == "possible"


# ----------------------------------------------------------- timeseries

def test_seasonal_decompose_exact(spark):
    # 2 full weeks, group g: value = 10 on phase 0 days, 20 otherwise.
    # 1970-01-01 is phase 0 by the epoch-mod definition.
    rows = [
        ("g", f"1970-01-{d:02d} 12:00:00", 10.0 if (d - 1) % 7 == 0 else 20.0)
        for d in range(1, 15)
    ]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), F.col("v").alias("v")
    )
    out = seasonal_decompose(df, "ts", "v", "g").collect()
    by_day = {str(r["day"]): r for r in out}
    assert len(by_day) == 14
    # grand mean = (2*10 + 12*20)/14 = 260/14; phase-0 mean = 10
    grand = 260.0 / 14
    r0 = by_day["1970-01-01"]
    assert r0["phase"] == 0
    assert r0["total"] == 10.0
    assert r0["seasonal"] == pytest.approx(round(10 - grand, 6), abs=1e-6)
    assert r0["residual"] == pytest.approx(0.0)
    r1 = by_day["1970-01-02"]
    assert r1["seasonal"] == pytest.approx(round(20 - grand, 6), abs=1e-6)
    # identity: total = grand + seasonal + residual on every day
    for r in out:
        assert r["total"] == pytest.approx(
            grand + r["seasonal"] + r["residual"], abs=1e-5
        )


def test_seasonal_decompose_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("g", "1970-01-01 00:00:00", None), ("g", "1970-01-02 00:00:00", 5.0)],
        "g string, ts string, v double",
    ).select("g", F.col("ts").cast("timestamp").alias("ts"), "v")
    out = seasonal_decompose(df, "ts", "v", "g").collect()
    assert len(out) == 1 and out[0]["total"] == 5.0


# ------------------------------------------------------------ retrieval

def test_phrase_match_positions_and_overlap(spark):
    docs = spark.createDataFrame(
        [
            (1, "big table part small table part"),  # matches at 1 and 4
            (2, "table part"),  # match at 0
            (3, "part table"),  # reversed: no match
            (4, "table and part"),  # not adjacent: no match
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match(docs, ["table", "part"]).collect()
    }
    assert got == {1: (2, 1), 2: (1, 0)}


def test_phrase_match_repeated_word_overlap(spark):
    # "table table table" contains the phrase (table, table) TWICE
    # (positions 0-1 and 1-2) — substring counting would see one
    docs = spark.createDataFrame(
        [(1, "table table table")], "doc_id long, text string"
    )
    r = phrase_match(docs, ["table", "table"]).collect()[0]
    assert (r["n_matches"], r["first_pos"]) == (2, 0)


def test_phrase_match_three_terms(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b x c")], "doc_id long, text string"
    )
    got = {r["doc_id"] for r in phrase_match(docs, ["a", "b", "c"]).collect()}
    assert got == {1}


def test_phrase_match_rejects_single_term(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        phrase_match(docs, ["x"])


# -------------------------------------------------------------- quality

def test_readability_counts_and_scores(spark):
    # "the cat sat. it ran!" -> words 5, sentences 2,
    # syllables: e/a/a/i/a -> 5 vowel groups
    docs = spark.createDataFrame(
        [(1, "the cat sat. it ran!"), (2, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    r = rows[1]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
    wps, spw = 5 / 2, 5 / 5
    assert r["flesch_ease"] == pytest.approx(
        round(206.835 - 1.015 * wps - 84.6 * spw, 4)
    )
    assert r["fk_grade"] == pytest.approx(
        round(0.39 * wps + 11.8 * spw - 15.59, 4)
    )
    # empty doc: zero words, sentence floor 1, NULL scores
    r2 = rows[2]
    assert (r2["n_words"], r2["n_sentences"]) == (0, 1)
    assert r2["flesch_ease"] is None and r2["fk_grade"] is None


def test_readability_unpunctuated_floor(spark):
    docs = spark.createDataFrame(
        [(1, "no punctuation here")], "doc_id long, text string"
    )
    r = readability_scores(docs).collect()[0]
    assert r["n_sentences"] == 1 and r["n_words"] == 3


# ----------------------------------------------------- cross-correlation

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


def test_cross_correlation_perfect_lead(spark):
    from datacamp_etl_spark.operators.timeseries import cross_correlation

    # b at day d+1 = 2 * a at day d  ->  r(lag=+1) == 1.0 exactly
    rows = []
    vals = [10.0, 30.0, 20.0, 50.0, 40.0]
    for i, v in enumerate(vals, start=1):
        rows.append((1, f"1970-01-{i:02d} 01:00:00", "a", v))
        rows.append((1, f"1970-01-{i+1:02d} 01:00:00", "b", 2 * v))
    out = cross_correlation(
        _ev(spark, rows), "ts", "value", "event_type", "a", "b", max_lag=2
    )
    r = {row["lag"]: row for row in out.collect()}
    assert r[1]["r"] == pytest.approx(1.0)
    assert r[1]["n_days"] == 5
    # lag 0 overlaps on days 2..5 (4 points) with imperfect alignment
    assert r[0]["n_days"] == 4
    assert r[0]["r"] is None or abs(r[0]["r"]) < 1.0


def test_cross_correlation_null_on_degenerate(spark):
    from datacamp_etl_spark.operators.timeseries import cross_correlation

    # constant series -> zero variance -> NULL r, never a div-by-zero
    rows = [
        (1, "1970-01-01 01:00:00", "a", 5.0),
        (1, "1970-01-02 01:00:00", "a", 5.0),
        (1, "1970-01-01 02:00:00", "b", 1.0),
        (1, "1970-01-02 02:00:00", "b", 9.0),
    ]
    out = cross_correlation(
        _ev(spark, rows), "ts", "value", "event_type", "a", "b", max_lag=0
    ).collect()
    assert len(out) == 1 and out[0]["r"] is None


# ------------------------------------------------ position-based attribution

def test_attribution_u_shape_exact_ppm(spark):
    from datacamp_etl_spark.operators.funnel import attribution_position_based

    # one user: click, view, click, then purchase -> k=3:
    # first click 400000, middle view 200000, last click 400000
    rows = [
        (1, "1970-01-01 00:01:00", "click", 1.0),
        (1, "1970-01-01 00:02:00", "view", 1.0),
        (1, "1970-01-01 00:03:00", "click", 1.0),
        (1, "1970-01-01 00:04:00", "purchase", 1.0),
    ]
    out = attribution_position_based(
        _ev(spark, rows), "purchase", ["click", "view"]
    )
    got = {r["channel"]: r for r in out.collect()}
    assert got["click"]["credit_ppm"] == 800_000
    assert got["view"]["credit_ppm"] == 200_000
    assert got["click"]["n_touches"] == 2
    assert "direct" not in got


def test_attribution_remainder_and_conservation(spark):
    from datacamp_etl_spark.operators.funnel import attribution_position_based

    # k=5 touches: shares 400000/66668/66666/66666/400000 (remainder 2
    # goes to the FIRST middle) — total exactly 1_000_000
    rows = [
        (1, f"1970-01-01 00:0{i}:00", "click", 1.0) for i in range(1, 6)
    ] + [(1, "1970-01-01 00:06:00", "purchase", 1.0)]
    out = attribution_position_based(
        _ev(spark, rows), "purchase", ["click", "view"]
    ).collect()
    assert sum(r["credit_ppm"] for r in out) == 1_000_000


def test_attribution_direct_and_window(spark):
    from datacamp_etl_spark.operators.funnel import attribution_position_based

    rows = [
        # user 1: touch 2 days before purchase -> outside 24h -> direct
        (1, "1970-01-01 00:00:00", "click", 1.0),
        (1, "1970-01-03 00:00:00", "purchase", 1.0),
        # user 2: clean single-touch conversion
        (2, "1970-01-01 00:00:00", "view", 1.0),
        (2, "1970-01-01 01:00:00", "purchase", 1.0),
    ]
    out = attribution_position_based(
        _ev(spark, rows), "purchase", ["click", "view"]
    )
    got = {r["channel"]: r for r in out.collect()}
    assert got["direct"]["credit_ppm"] == 1_000_000
    assert got["view"]["credit_ppm"] == 1_000_000
    assert "click" not in got


def test_attribution_two_touch_split(spark):
    from datacamp_etl_spark.operators.funnel import attribution_position_based

    rows = [
        (1, "1970-01-01 00:01:00", "click", 1.0),
        (1, "1970-01-01 00:02:00", "view", 1.0),
        (1, "1970-01-01 00:03:00", "purchase", 1.0),
    ]
    got = {
        r["channel"]: r["credit_ppm"]
        for r in attribution_position_based(
            _ev(spark, rows), "purchase", ["click", "view"]
        ).collect()
    }
    assert got == {"click": 500_000, "view": 500_000}


# ------------------------------------------------------------------ KWIC

def test_kwic_contexts_and_edges(spark):
    from datacamp_etl_spark.operators.text import kwic_concordance

    docs = spark.createDataFrame(
        [
            (1, "a b spark c d"),
            (2, "spark x"),
            (3, "y spark"),
            (4, "no match here"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["pos"]): r["context"]
        for r in kwic_concordance(docs, "spark", context=2).collect()
    }
    assert got == {
        (1, 2): "a b spark c d",
        (2, 0): "spark x",
        (3, 1): "y spark",
    }


def test_kwic_multiple_occurrences(spark):
    from datacamp_etl_spark.operators.text import kwic_concordance

    docs = spark.createDataFrame(
        [(1, "spark a spark")], "doc_id long, text string"
    )
    rows = kwic_concordance(docs, "spark", context=1).collect()
    got = {(r["pos"], r["context"]) for r in rows}
    assert got == {(0, "spark a"), (2, "a spark")}


# ------------------------------------------------------------- novelty

def test_ngram_novelty_copy_detection(spark):
    from datacamp_etl_spark.operators.text import ngram_novelty

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),       # all 3 shingles first seen here
            (2, "a b c d e"),       # verbatim copy -> novelty 0
            (3, "x y z w"),         # fresh -> novelty 1
            (4, "a b"),             # too short for 3-shingles
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(docs, k=3).collect()}
    assert got[1]["n_grams"] == 3 and got[1]["novelty"] == 1.0
    assert got[2]["n_grams"] == 3 and got[2]["novelty"] == 0.0
    assert got[3]["novelty"] == 1.0
    assert got[4]["n_grams"] == 0 and got[4]["novelty"] is None


def test_vocab_growth_two_buckets(spark):
    from datacamp_etl_spark.operators.text import vocab_growth

    docs = spark.createDataFrame(
        [
            (1, "a b a"),      # bucket 1: 3 tokens, types {a, b}
            (2, "b c"),        # bucket 2: 2 tokens, new type {c}
        ],
        "doc_id long, text string",
    )
    got = {r["bucket"]: r for r in vocab_growth(docs, buckets=2).collect()}
    assert got[1]["n_tokens"] == 3 and got[1]["new_types"] == 2
    assert got[2]["n_tokens"] == 2 and got[2]["new_types"] == 1
    assert got[2]["cum_tokens"] == 5 and got[2]["cum_types"] == 3


def test_vocab_growth_token_free_bucket(spark):
    # r13 single-tokenize restructure: a bucket whose documents carry
    # zero tokens must still report a (bucket, 0, 0) row via the
    # pruned bucket spine (the exploded count table has no row for it)
    from datacamp_etl_spark.operators.text import vocab_growth

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "")],  # bucket 2 = one token-free doc
        "doc_id long, text string",
    )
    got = {r["bucket"]: r for r in vocab_growth(docs, buckets=2).collect()}
    assert sorted(got) == [1, 2]
    assert got[2]["n_tokens"] == 0 and got[2]["new_types"] == 0
    assert got[2]["cum_tokens"] == 3 and got[2]["cum_types"] == 2


# ----------------------------------------------------------- burstiness

def test_burstiness_metronome_and_cutoff(spark):
    from datacamp_etl_spark.operators.timeseries import (
        interarrival_burstiness,
    )

    rows = [
        # user 1: perfect metronome, gap 60s -> sigma 0 -> B = -1
        (1, "1970-01-01 00:01:00", "click", 1.0),
        (1, "1970-01-01 00:02:00", "click", 1.0),
        (1, "1970-01-01 00:03:00", "click", 1.0),
        (1, "1970-01-01 00:04:00", "click", 1.0),
        # user 2: only 2 events -> below min_events, dropped
        (2, "1970-01-01 00:01:00", "click", 1.0),
        (2, "1970-01-01 00:02:00", "click", 1.0),
    ]
    out = interarrival_burstiness(
        _ev(spark, rows), "ts", "user_id", order_col="event_id"
    )
    got = {r["user_id"]: r for r in out.collect()}
    assert set(got) == {1}
    assert got[1]["burstiness"] == pytest.approx(-1.0)
    assert got[1]["mean_gap_s"] == pytest.approx(60.0)
    assert got[1]["n_events"] == 4


def test_burstiness_bursty_user_positive_shift(spark):
    from datacamp_etl_spark.operators.timeseries import (
        interarrival_burstiness,
    )

    # gaps 1s, 1s, 3598s — replicate the exact formula in Python
    rows = [
        (1, "1970-01-01 00:00:00", "c", 1.0),
        (1, "1970-01-01 00:00:01", "c", 1.0),
        (1, "1970-01-01 00:00:02", "c", 1.0),
        (1, "1970-01-01 01:00:00", "c", 1.0),
    ]
    import math

    gaps = [1e6, 1e6, 3598e6]
    mu = sum(gaps) / 3
    sigma = math.sqrt(sum(g * g for g in gaps) * 3 - sum(gaps) ** 2) / 3
    expect = round((sigma - mu) / (sigma + mu), 6)
    out = interarrival_burstiness(
        _ev(spark, rows), "ts", "user_id", order_col="event_id"
    ).collect()
    assert out[0]["burstiness"] == pytest.approx(expect)
    assert 0 < out[0]["burstiness"] < 1


# ------------------------------------------------------------------ gini

def test_gini_uniform_and_concentrated(spark):
    from datacamp_etl_spark.operators.profile import gini_by_group

    df = spark.createDataFrame(
        [
            ("even", 1, 10), ("even", 2, 10), ("even", 3, 10),
            ("conc", 4, 0), ("conc", 5, 0), ("conc", 6, 10),
            ("zero", 7, 0),
        ],
        "src string, id long, x long",
    )
    got = {
        r["src"]: r for r in gini_by_group(df, "src", "x", "id").collect()
    }
    assert got["even"]["gini"] == pytest.approx(0.0)
    # (0,0,10): G = 2*30/(3*10) - 4/3 = 2/3
    assert got["conc"]["gini"] == pytest.approx(round(2 / 3, 6))
    assert got["zero"]["gini"] is None


# ---------------------------------------------------------------- basket

def test_basket_pair_lift_hand_case(spark):
    from datacamp_etl_spark.operators.basket import basket_pair_lift

    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a"),
            (1, "a")]  # duplicate line in basket 1 must not double-count
    df = spark.createDataFrame(rows, "b long, i string")
    out = basket_pair_lift(df, "b", "i", min_pair_count=1)
    got = {(r["item_a"], r["item_b"]): r for r in out.collect()}
    # N=3, n_a=3, n_b=2, n_c=1, n_ab=2
    ab = got[("a", "b")]
    assert ab["n_pair"] == 2
    assert ab["support"] == pytest.approx(round(2 / 3, 6))
    assert ab["confidence_ab"] == pytest.approx(round(2 / 3, 6))
    assert ab["lift"] == pytest.approx(1.0)
    assert got[("b", "c")]["lift"] == pytest.approx(1.5)
    # threshold filters singleton pairs
    only = basket_pair_lift(df, "b", "i", min_pair_count=2).collect()
    assert {(r["item_a"], r["item_b"]) for r in only} == {("a", "b")}


def test_basket_pair_lift_mega_basket_cap(spark):
    from datacamp_etl_spark.operators.basket import basket_pair_lift

    rows = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "b long, i string")
    out = basket_pair_lift(
        df, "b", "i", min_pair_count=1, max_basket_size=2
    ).collect()
    # basket 1 (3 items) dropped entirely: only basket 2's pair remains
    # and N counts surviving baskets only (N=1)
    assert len(out) == 1
    r = out[0]
    assert (r["item_a"], r["item_b"], r["n_pair"]) == ("a", "b", 1)
    assert r["support"] == pytest.approx(1.0)


# ------------------------------------------------------------------- rfm

def test_rfm_segments_quintile_semantics(spark):
    from datacamp_etl_spark.operators.profile import rfm_segments

    # 4 customers, ntiles=2: customer 4 is most recent, most frequent,
    # highest spend -> (2,2,2); customer 1 the opposite -> (1,1,1)
    rows = []
    for c, (n_orders, day, price) in {
        1: (1, "1996-01-01", 10.0),
        2: (2, "1996-02-01", 20.0),
        3: (3, "1996-03-01", 30.0),
        4: (4, "1996-04-01", 40.0),
    }.items():
        for k in range(n_orders):
            rows.append((c, f"{day} 00:00:00", price))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate string, o_totalprice double"
    ).select(
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
    )
    got = {r["o_custkey"]: r for r in rfm_segments(df, ntiles=2).collect()}
    assert (got[1]["r"], got[1]["f"], got[1]["m"]) == (1, 1, 1)
    assert (got[4]["r"], got[4]["f"], got[4]["m"]) == (2, 2, 2)
    assert got[4]["segment"] == 222 and got[1]["segment"] == 111
    # monetary = count * price: cust2 2*20=40 < cust3 3*30=90
    assert got[2]["m"] == 1 and got[3]["m"] == 2


# ------------------------------------------------------ seasonal-naive

def test_seasonal_naive_backtest_exact(spark):
    from datacamp_etl_spark.operators.timeseries import (
        seasonal_naive_backtest,
    )

    # week 1: 10 every day; week 2: 13 every day
    # -> 7 scored days, every error = 3, MAE = 3, WAPE = 21/91
    rows = [
        ("g", f"1970-01-{d:02d} 01:00:00", 10.0 if d <= 7 else 13.0)
        for d in range(1, 15)
    ]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = seasonal_naive_backtest(df, "ts", "v", "g").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_days"] == 7
    assert r["mae"] == pytest.approx(3.0)
    assert r["wape"] == pytest.approx(round(21 / 91, 6))


def test_seasonal_naive_backtest_no_overlap(spark):
    from datacamp_etl_spark.operators.timeseries import (
        seasonal_naive_backtest,
    )

    # 3 days of data, season 7 -> no (day, day-7) pairs -> no rows
    rows = [("g", f"1970-01-{d:02d} 01:00:00", 5.0) for d in range(1, 4)]
    df = spark.createDataFrame(rows, "g string, ts string, v double").select(
        "g", F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    assert seasonal_naive_backtest(df, "ts", "v", "g").count() == 0


# -------------------------------------------------------------- chi2

def test_shard_chi2_perfectly_uniform(spark):
    from datacamp_etl_spark.operators.skew import shard_uniformity_chi2

    df = spark.range(0, 320).select((F.col("id") % 32).alias("bk"))
    r = shard_uniformity_chi2(df, "bk", 32, critical_value=44.985).collect()[0]
    assert r["chi2"] == pytest.approx(0.0)
    assert bool(r["uniform"]) is True
    assert r["n_rows"] == 320


def test_shard_chi2_degenerate_skew(spark):
    from datacamp_etl_spark.operators.skew import shard_uniformity_chi2

    # all rows in one bucket of 32: chi2 = k*n^2/n - n = n*(k-1)
    df = spark.range(0, 100).select(F.lit(0).alias("bk"))
    r = shard_uniformity_chi2(df, "bk", 32, critical_value=44.985).collect()[0]
    assert r["chi2"] == pytest.approx(100 * 31)
    assert bool(r["uniform"]) is False


# ------------------------------------------------------------------- ppr

def test_personalized_pagerank_two_node_hand_case(spark):
    from datacamp_etl_spark.operators.graph import personalized_pagerank

    e = _edges(spark, [(1, 2)])
    seeds = spark.createDataFrame([(1,)], "node long")
    # hand-rolled: r0=(1,0); round1 -> (0.15, 0.85);
    # round2: dangling mass 0.85 teleports to seed ->
    #   r(1)=0.15+0.85*0.85=0.8725, r(2)=0.85*0.15=0.1275
    out = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(e, seeds, iterations=2).collect()
    }
    assert out[1] == pytest.approx(0.8725)
    assert out[2] == pytest.approx(0.1275)
    assert sum(out.values()) == pytest.approx(1.0)


def test_personalized_pagerank_conserves_and_localizes(spark):
    from datacamp_etl_spark.operators.graph import personalized_pagerank

    # two disjoint chains; seed only in the first -> second chain
    # keeps rank 0 (teleport never reaches it)
    e = _edges(spark, [(1, 2), (2, 3), (10, 11), (11, 12)])
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {
        r["node"]: r["rank"]
        for r in personalized_pagerank(e, seeds, iterations=3).collect()
    }
    assert sum(out.values()) == pytest.approx(1.0)
    assert out[10] == 0.0 and out[11] == 0.0 and out[12] == 0.0
    assert out[1] > out[3] > 0  # decays with distance from the seed


def test_personalized_pagerank_empty_seeds_raises(spark):
    from datacamp_etl_spark.operators.graph import personalized_pagerank

    e = _edges(spark, [(1, 2)])
    seeds = spark.createDataFrame([], "node long")
    with pytest.raises(ValueError):
        personalized_pagerank(e, seeds)


def test_degree_distribution_plain_and_log2(spark):
    from datacamp_etl_spark.operators.graph import degree_distribution

    # star 0-{1..5}: hub deg 5, leaves deg 1
    e = [(0, i) for i in range(1, 6)]
    got = {
        r["deg"]: r["n_nodes"]
        for r in degree_distribution(_edges(spark, e)).collect()
    }
    assert got == {5: 1, 1: 5}
    log2 = {
        r["deg"]: r["n_nodes"]
        for r in degree_distribution(
            _edges(spark, e), log2_buckets=True
        ).collect()
    }
    assert log2 == {4: 1, 1: 5}  # 5 -> bucket 2^2=4, 1 -> 2^0=1


# ---------------------------------------------------------------- z-test

def test_two_proportion_ztest_hand_case(spark):
    import math

    from datacamp_etl_spark.operators.profile import two_proportion_ztest

    rows = (
        [("A", 1)] * 30 + [("A", 0)] * 70 + [("B", 1)] * 10 + [("B", 0)] * 90
    )
    df = spark.createDataFrame(rows, "grp string, conv int")
    r = two_proportion_ztest(
        df, "grp", "conv", group_a="A", group_b="B"
    ).collect()[0]
    assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (100, 30, 100, 10)
    pool = 40 / 200
    se = math.sqrt(pool * (1 - pool) * (1 / 100 + 1 / 100))
    assert r["z"] == pytest.approx(round((0.3 - 0.1) / se, 6))
    assert bool(r["significant"]) is True


def test_two_proportion_ztest_degenerate_null(spark):
    from datacamp_etl_spark.operators.profile import two_proportion_ztest

    df = spark.createDataFrame(
        [("A", 1), ("A", 1), ("B", 1)], "grp string, conv int"
    )
    r = two_proportion_ztest(
        df, "grp", "conv", group_a="A", group_b="B"
    ).collect()[0]
    assert r["z"] is None and r["significant"] is None


# ------------------------------------------------- composition entries

def test_session_duration_histogram_buckets(spark, sf_dir):
    from datacamp_etl_spark.queries import QUERIES

    rows = QUERIES["session_duration_histogram"](spark, sf_dir).collect()
    got = {r["bucket_s"]: r["n_sessions"] for r in rows}
    # buckets are powers of two (or 0), counts positive
    for b, n in got.items():
        assert b == 0 or (b & (b - 1)) == 0
        assert n > 0


def test_lang_source_association_consistency(spark, sf_dir):
    import math

    from datacamp_etl_spark.queries import QUERIES

    rows = QUERIES["lang_source_association"](spark, sf_dir).collect()
    n_total = sum(r["n"] for r in rows)
    assert n_total > 0
    # recompute lift/pmi from the exact counts (pmi is ln of the RAW
    # lift, not of the rounded one)
    nl = {}
    ns = {}
    for r in rows:
        nl[r["lang"]] = nl.get(r["lang"], 0) + r["n"]
        ns[r["source"]] = ns.get(r["source"], 0) + r["n"]
    for r in rows:
        raw = r["n"] * n_total / (nl[r["lang"]] * ns[r["source"]])
        assert r["lift"] == pytest.approx(round(raw, 6), abs=2e-6)
        assert r["pmi"] == pytest.approx(round(math.log(raw), 6), abs=2e-6)


# ----------------------------------------------------------------- churn

def test_churn_rates_hand_case(spark):
    from datacamp_etl_spark.operators.funnel import churn_rates

    # window 00:00..02:00, midpoint 01:00.
    # user 1: early only -> churned; user 2: both halves -> retained;
    # user 3: late only -> not counted in the early base
    rows = [
        (1, "1970-01-01 00:10:00", "c", 1.0),
        (2, "1970-01-01 00:20:00", "c", 1.0),
        (2, "1970-01-01 01:50:00", "c", 1.0),
        (3, "1970-01-01 02:00:00", "c", 1.0),
    ]
    r = churn_rates(_ev(spark, rows)).collect()[0]
    assert (r["n_active_early"], r["n_retained"], r["n_churned"]) == (2, 1, 1)
    assert r["churn_rate"] == pytest.approx(0.5)


def test_churn_rates_boundary_is_early(spark):
    from datacamp_etl_spark.operators.funnel import churn_rates

    # two events exactly at min and max: midpoint event counts early
    rows = [
        (1, "1970-01-01 00:00:00", "c", 1.0),
        (1, "1970-01-01 02:00:00", "c", 1.0),
        (2, "1970-01-01 01:00:00", "c", 1.0),  # exactly the midpoint
    ]
    r = churn_rates(_ev(spark, rows)).collect()[0]
    # user 1 retained (both halves), user 2 early-only -> churned
    assert (r["n_active_early"], r["n_churned"]) == (2, 1)


def test_bm25_mrr_eval_bounds(spark, sf_dir):
    from datacamp_etl_spark.queries import QUERIES

    r = QUERIES["bm25_mrr_eval"](spark, sf_dir).collect()[0]
    assert 0.0 <= r["precision_at_10"] <= 1.0
    assert 0.0 <= r["mrr_at_10"] <= 1.0
    assert r["hits_at_10"] <= min(10, r["n_relevant"])
    if r["n_relevant"] > 0 and r["hits_at_10"] > 0:
        assert r["mrr_at_10"] > 0
