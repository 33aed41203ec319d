"""Dedup operators [EXT]: exact, MinHash/LSH, Jaccard, SimHash."""

from __future__ import annotations

from datacamp_etl_spark.operators import dedup as D


def _docs(spark):
    base = "spark filter join group agg window sort merge scan hash"
    near = "spark filter join group agg window sort merge scan vector"  # 1 word off
    other = "completely different words about cats dogs birds and fish today"
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),                   # exact dup of 1
            (3, near),                   # near dup of 1
            (4, other),
            (5, "Spark  Filter join GROUP agg window sort merge scan hash"),  # exact after normalize
        ],
        "doc_id long, text string",
    )


def test_exact_duplicates(spark):
    groups = D.exact_duplicates(_docs(spark)).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 3
    assert groups[0]["keep_id"] == 1


def test_dedup_exact_keeps_min_id(spark):
    out = D.dedup_exact(_docs(spark))
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3, 4]


def test_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    rows = df.select(D.shingles("text", 3).alias("sh")).collect()
    assert sorted(rows[0]["sh"]) == ["a b c", "b c d"]
    short = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert short.select(D.shingles("text", 3).alias("sh")).collect()[0]["sh"] == []


def test_minhash_identical_docs_same_signature(spark):
    sig = D.minhash_signature(_docs(spark)).collect()
    by_doc = {}
    for r in sig:
        by_doc.setdefault(r["doc_id"], {})[r["seed"]] = r["minhash"]
    assert by_doc[1] == by_doc[2] == by_doc[5]
    assert by_doc[1] != by_doc[4]
    assert len(by_doc[1]) == 16


def test_lsh_candidates_find_near_dups(spark):
    pairs = {(r["id_a"], r["id_b"]) for r in D.lsh_candidate_pairs(_docs(spark)).collect()}
    assert (1, 2) in pairs and (1, 5) in pairs and (2, 5) in pairs
    # near-dup 3 should collide with 1 on at least one band (13/16 seeds shared is likely)
    # the unrelated doc must not pair with the base cluster
    assert not any({a, b} == {1, 4} for a, b in pairs)


def test_lsh_mega_bucket_cap_bounds_fanout(spark):
    """The max_bucket_size guard: a degenerate bucket (here 6 exact
    copies of one text) emits NO pairs when the cap is below the
    bucket size — bounding the per-key join fan-out that would be n^2
    at 100 TB. With the cap disabled the same bucket emits all 15
    pairs."""
    clones = [(i, "same exact text repeated for every clone row") for i in range(6)]
    df = spark.createDataFrame(
        clones + [(10, "an unrelated document with distinct words in it ok")],
        "doc_id long, text string",
    )
    capped = D.lsh_candidate_pairs(df, max_bucket_size=5).collect()
    assert capped == []
    uncapped = D.lsh_candidate_pairs(df, max_bucket_size=None).collect()
    assert len(uncapped) == 15  # C(6,2)


def test_ngram_jaccard(spark):
    pairs = {
        (r["id_a"], r["id_b"]): float(r["jaccard"])
        for r in D.ngram_jaccard_pairs(_docs(spark), threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert 0.3 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_simhash_properties(spark):
    sig = {r["doc_id"]: r["simhash"] for r in D.simhash(_docs(spark)).collect()}
    assert sig[1] == sig[2] == sig[5]
    assert sig[1] != sig[4]
    assert all(0 <= s < 2**60 for s in sig.values())


def test_simhash_near_pairs(spark):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_near_pairs(_docs(spark), max_hamming=10).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 5)] == 0
    assert (1, 4) not in pairs
    if (1, 3) in pairs:  # near dup within 10 bits
        assert pairs[(1, 3)] > 0


def test_simhash_fast_path_matches_bits_reference(spark):
    """The packed 60-agg simhash must equal assembly from the
    row-shaped _simhash_bits reference implementation."""
    from pyspark.sql import functions as F

    docs = _docs(spark)
    fast = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    ref = {
        r["doc_id"]: r["simhash"]
        for r in D._simhash_bits(docs, "doc_id", "text")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("bitval") * F.expr("shiftleft(1L, bit)"))
            .cast("long")
            .alias("simhash")
        )
        .collect()
    }
    assert fast == ref


def test_ngram_prefix_strategy_lossless(spark):
    """Prefix filtering (PPJoin pigeonhole over the df-sorted order)
    must return EXACTLY the pairs the direct expansion returns, at any
    threshold — it is a lossless pruning, not an approximation."""
    docs = _docs(spark)
    for thr in (0.2, 0.5, 0.8):
        expand = {
            (r["id_a"], r["id_b"], r["n_common"], r["n_union"])
            for r in D.ngram_jaccard_pairs(
                docs, threshold=thr, strategy="expand"
            ).collect()
        }
        prefix = {
            (r["id_a"], r["id_b"], r["n_common"], r["n_union"])
            for r in D.ngram_jaccard_pairs(
                docs, threshold=thr, strategy="prefix"
            ).collect()
        }
        assert expand == prefix, f"strategy mismatch at t={thr}"
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown strategy"):
        D.ngram_jaccard_pairs(docs, strategy="teleport")


def test_ngram_expand_size_guard(spark):
    """The no-candidates expand path must refuse sum(df²) work above
    max_expand_rows and point at the candidates-first scale recipe;
    passing candidates= (the 100 TB path) bypasses the guard, and the
    guarded/unguarded paths stay result-identical."""
    import pytest as _pytest

    docs = _docs(spark)
    with _pytest.raises(ValueError, match="lsh_candidate_pairs"):
        D.ngram_jaccard_pairs(
            docs, threshold=0.2, strategy="expand", max_expand_rows=2
        )
    # candidates= never counts the input: the tiny cap must not trip.
    cand = D.lsh_candidate_pairs(docs)
    verified = D.ngram_jaccard_pairs(
        docs, threshold=0.2, candidates=cand, max_expand_rows=2
    )
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    full = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(
            docs, threshold=0.2, strategy="expand"
        ).collect()
    }
    assert got <= full


def test_span_dedup_keeps_first_occurrence(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),          # spans: "a b c", "d e f"
            (2, "a b c x y z"),          # "a b c" repeats -> dropped
            (3, "x y z d e f"),          # both spans seen -> empty
            (4, ""),                     # empty doc
            (5, "q r"),                  # one partial span, unique
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in D.span_dedup(docs, span=3).collect()}
    assert out[1]["dedup_text"] == "a b c d e f"
    assert (out[1]["n_spans"], out[1]["n_kept"]) == (2, 2)
    assert out[2]["dedup_text"] == "x y z"
    assert (out[2]["n_spans"], out[2]["n_kept"]) == (2, 1)
    assert out[3]["dedup_text"] == ""
    assert (out[3]["n_spans"], out[3]["n_kept"]) == (2, 0)
    assert (out[4]["n_spans"], out[4]["n_kept"], out[4]["dedup_text"]) == (0, 0, "")
    assert out[5]["dedup_text"] == "q r"


def test_span_dedup_partition_invariant(spark):
    docs = spark.createDataFrame(
        [(i, f"tok{i % 7} a b c d e common phrase here") for i in range(40)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, D.span_dedup(docs, span=3).collect()))
    b = sorted(map(tuple, D.span_dedup(docs.repartition(11), span=3).collect()))
    assert a == b


def test_span_dedup_no_window_on_fingerprint(spark):
    """Keep-first must be groupBy-min (map-side combinable), not a
    window over the span hash — a hot boilerplate span would straggle
    a window partition at 100 TB."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    plan = D.span_dedup(docs)._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in plan, plan


def test_lsh_band_plan_tracks_threshold():
    """The a-priori banding planner must steepen with the threshold:
    low-t plans favor many bands (recall), high-t plans favor long
    rows (precision), and the s-curve midpoint tracks the target."""
    lo = D.lsh_band_plan(16, 0.2)
    mid = D.lsh_band_plan(16, 0.5)
    hi = D.lsh_band_plan(16, 0.8)
    assert lo["rows"] < hi["rows"]
    assert lo["bands"] > hi["bands"]
    assert lo["s50"] < mid["s50"] < hi["s50"]
    for plan in (lo, mid, hi):
        assert plan["bands"] * plan["rows"] <= 16
    # probability curve is monotone in s and hits the extremes
    ps = [D.lsh_candidate_probability(s / 10, 4, 4) for s in range(11)]
    assert ps == sorted(ps)
    assert ps[0] == 0.0 and abs(ps[-1] - 1.0) < 1e-12
    # fp_weight pressure pushes the plan toward precision
    fp_heavy = D.lsh_band_plan(16, 0.5, fp_weight=10.0)
    assert fp_heavy["rows"] >= mid["rows"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        D.lsh_band_plan(0, 0.5)
    with _pytest.raises(ValueError):
        D.lsh_band_plan(16, 1.0)


def test_lsh_band_plan_only_exact_divisors():
    """Planner candidates must execute as planned: band_signatures
    derives rows_per_band = num_hashes // bands, so a non-divisor
    rows value would leave a partial leftover band whose s-curve the
    plan never modeled. Every recommended (bands, rows) must tile
    num_hashes exactly."""
    for nh in (12, 16, 20, 64):
        for t in (0.1, 0.2, 0.5, 0.8):
            plan = D.lsh_band_plan(nh, t)
            assert plan["bands"] * plan["rows"] == nh, (nh, t, plan)


def test_bands_auto_delegates_to_planner(spark):
    """bands='auto' must pick the planner's banding for the given
    threshold: 8x2 at t=0.2 (the organic-fixture finding), 4x4 near
    t=0.5 — and produce the identical candidate set to passing that
    banding explicitly."""
    assert D.lsh_band_plan(16, 0.2)["bands"] == 8
    assert D.lsh_band_plan(16, 0.5)["bands"] == 4
    docs = _docs(spark)
    auto = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(docs, bands="auto", threshold=0.2).collect()
    }
    explicit = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(docs, bands=8).collect()
    }
    assert auto == explicit
    # default threshold (0.5) reproduces the historical 4-band default
    auto_default = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(docs, bands="auto").collect()
    }
    legacy = {
        (r["id_a"], r["id_b"]) for r in D.lsh_candidate_pairs(docs).collect()
    }
    assert auto_default == legacy


def test_bands_auto_argument_validation(spark):
    import pytest as _pytest

    docs = _docs(spark)
    with _pytest.raises(ValueError, match="auto"):
        D.lsh_candidate_pairs(docs, bands="sixteen")
    with _pytest.raises(ValueError, match="threshold"):
        # threshold with explicit bands would silently not apply
        D.lsh_candidate_pairs(docs, bands=8, threshold=0.2)


def test_incremental_dedup_bands_auto(spark):
    """incremental_dedup(bands='auto', threshold=) must agree with the
    equivalent explicit banding when the corpus index was built with
    the same plan."""
    docs = _docs(spark)
    corpus = docs.limit(2)
    idx_auto = D.band_signatures(corpus, bands="auto", threshold=0.2)
    surv_auto = D.incremental_dedup(docs, idx_auto, bands="auto", threshold=0.2)
    idx_8 = D.band_signatures(corpus, bands=8)
    surv_8 = D.incremental_dedup(docs, idx_8, bands=8)
    assert sorted(r["doc_id"] for r in surv_auto.collect()) == sorted(
        r["doc_id"] for r in surv_8.collect()
    )


def _lang_docs(spark):
    """Docs with a lang stratum: two near-dup clusters in 'en', one
    unrelated 'fr' doc, enough rows that a k=2 sample is a strict
    subset of the 'en' stratum."""
    base = "spark filter join group agg window sort merge scan hash"
    rows = [
        (i, "en", base + f" tail{i % 2}") for i in range(1, 7)
    ] + [(7, "fr", "unrelated words about cats dogs birds fish today now")]
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_dedup_recall_full_corpus(spark):
    """Unsampled mode: schema + the recall/CI math on a corpus where
    the 8x2 banding surfaces every true pair (exact dups hash
    identically in every band)."""
    row = D.dedup_recall(_lang_docs(spark), bands=8).collect()[0]
    assert row["n_docs"] == 7
    assert row["n_true"] > 0
    assert row["n_hits"] <= row["n_true"]
    if row["n_hits"] == row["n_true"]:
        assert row["recall"] == 1.0 and row["ci95_halfwidth"] == 0.0
    else:
        import math

        r = row["n_hits"] / row["n_true"]
        assert abs(row["recall"] - round(r, 6)) < 1e-12
        assert abs(
            row["ci95_halfwidth"]
            - round(1.96 * math.sqrt(r * (1 - r) / row["n_true"]), 6)
        ) < 1e-12


def test_dedup_recall_sampled_is_strict_subset(spark):
    """sample_per_stratum must measure INSIDE the deterministic
    stratified sample: n_docs = min(k, stratum size) summed over
    strata, and every reported pair count is bounded by the
    unsampled run's."""
    full = D.dedup_recall(_lang_docs(spark), bands=8).collect()[0]
    samp = D.dedup_recall(
        _lang_docs(spark), bands=8, sample_per_stratum=2
    ).collect()[0]
    assert samp["n_docs"] == 3  # 2 of 6 'en' + the single 'fr'
    assert samp["n_true"] <= full["n_true"]
    assert samp["n_candidates"] <= full["n_candidates"]
    assert samp["n_hits"] <= samp["n_true"]


def test_dedup_recall_zero_true_pairs_is_null(spark):
    """A sample with no true pairs must report NULL recall and NULL
    half-width, never a division error or a misleading 0.0."""
    docs = spark.createDataFrame(
        [
            (1, "en", "unique first document words here nothing shared one"),
            (2, "fr", "second entirely different content tokens apart two"),
        ],
        "doc_id long, lang string, text string",
    )
    row = D.dedup_recall(docs, bands=8).collect()[0]
    assert row["n_true"] == 0
    assert row["recall"] is None
    assert row["ci95_halfwidth"] is None
