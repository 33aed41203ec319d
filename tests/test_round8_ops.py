"""Round-8 operators: exact substring dedup (Lee et al. 2022)."""

from __future__ import annotations

import pytest


def _dedup(spark, rows, min_tokens=4):
    from datacamp_etl_spark.operators.dedup import substring_dedup

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return substring_dedup(docs, min_tokens=min_tokens).collect()


def test_shared_passage_found_and_maximal(spark):
    # 6-token shared passage inside otherwise-distinct docs; with
    # k=4 the passage yields 3 overlapping dup anchors per doc that
    # must merge into ONE maximal span of 6 tokens.
    shared = "one two three four five six"
    rows = [
        (1, f"alpha beta {shared} gamma delta"),
        (2, f"zeta {shared} eta theta iota"),
    ]
    out = _dedup(spark, rows)
    by_doc = {r["doc_id"]: r for r in out}
    assert len(out) == 2
    assert by_doc[1]["span_start"] == 2 and by_doc[1]["span_len"] == 6
    assert by_doc[2]["span_start"] == 1 and by_doc[2]["span_len"] == 6
    # content-identical maximal spans share the cluster key
    assert by_doc[1]["cluster"] == by_doc[2]["cluster"]


def test_below_min_tokens_not_reported(spark):
    # only a 3-token overlap -> no length-4 anchor can match
    rows = [
        (1, "one two three apple pear plum"),
        (2, "one two three house boat car"),
    ]
    assert _dedup(spark, rows) == []


def test_within_doc_repeat_is_not_cross_doc(spark):
    # the passage repeats inside ONE doc only: count(distinct doc) < 2
    rows = [
        (1, "a b c d x y z a b c d"),
        (2, "p q r s t u v w"),
    ]
    assert _dedup(spark, rows) == []


def test_two_separate_spans_stay_separate(spark):
    # two shared passages separated by > k distinct tokens in doc 1
    # must come out as two islands, not one merged span
    s1, s2 = "one two three four", "five six seven eight"
    rows = [
        (1, f"{s1} aa bb cc dd ee ff gg hh {s2}"),
        (2, f"xx {s1} yy"),
        (3, f"zz {s2} ww"),
    ]
    out = _dedup(spark, rows)
    d1 = sorted(
        [r for r in out if r["doc_id"] == 1], key=lambda r: r["span_start"]
    )
    assert [(r["span_start"], r["span_len"]) for r in d1] == [(0, 4), (12, 4)]
    clusters = {r["cluster"] for r in out}
    assert len(clusters) == 2  # one per distinct passage


def test_normalization_applies(spark):
    # case / punctuation differences normalize away -> still verbatim
    rows = [
        (1, "One, Two;  THREE four!"),
        (2, "prefix one two three four suffix words here"),
    ]
    out = _dedup(spark, rows)
    assert {r["doc_id"] for r in out} == {1, 2}


def test_min_tokens_validated(spark):
    with pytest.raises(ValueError):
        _dedup(spark, [(1, "a b c")], min_tokens=1)


def test_plan_shape(spark, sf_dir):
    """Scale posture: anchor meeting is hash-bucketed (no cartesian,
    no BNLJ) and the island window is partitioned by doc id."""
    from datacamp_etl_spark.queries import QUERIES

    df = QUERIES["substring_dedup"](spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


def test_nb_train_drops_tokenless_class(spark):
    """A class whose training docs are all empty vanishes from the
    model (documented nb_train contract): no prior row, never
    predicted."""
    from datacamp_etl_spark.operators.classify import nb_classify, nb_train

    train = spark.createDataFrame(
        [(0, "x y x", "a"), (1, "y z", "b"), (2, "", "ghost"), (3, "...", "ghost")],
        "doc_id long, text string, lang string",
    )
    model = nb_train(train)
    labels = {r["lang"] for r in model["priors"].collect()}
    assert labels == {"a", "b"}
    test = spark.createDataFrame(
        [(10, "unseen tokens only", "?")],
        "doc_id long, text string, lang string",
    )
    preds = {r["predicted"] for r in nb_classify(test, model).collect()}
    assert "ghost" not in preds


# ---------------------------------------------------------------------
# duplicate_text_fraction / psi_drift (round-8 stretch)
# ---------------------------------------------------------------------


def test_duplicate_text_fraction_covers_all_docs(spark):
    from datacamp_etl_spark.operators.dedup import duplicate_text_fraction

    shared = "one two three four"
    rows = [
        (1, f"{shared} aa bb cc dd"),          # 4 of 8 tokens shared
        (2, f"xx {shared} yy"),                # 4 of 6
        (3, "totally distinct text here now"), # 0 of 5
        (4, ""),                               # zero tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in duplicate_text_fraction(docs, min_tokens=4).collect()
    }
    assert set(out) == {1, 2, 3, 4}  # EVERY doc reported
    assert (out[1]["n_tokens"], out[1]["dup_tokens"]) == (8, 4)
    assert out[1]["dup_fraction"] == 0.5
    assert (out[2]["n_tokens"], out[2]["dup_tokens"]) == (6, 4)
    assert out[3]["dup_tokens"] == 0 and out[3]["dup_fraction"] == 0.0
    assert out[4]["n_tokens"] == 0 and out[4]["dup_fraction"] == 0.0


def test_psi_drift_zero_for_identical_and_positive_for_shift(spark):
    import math

    from datacamp_etl_spark.operators.profile import psi_drift

    a = spark.createDataFrame(
        [(float(i % 10),) for i in range(100)], "v double"
    )
    b = spark.createDataFrame(
        [(float(i % 10),) for i in range(100)], "v double"
    )
    same = psi_drift(a, b, "v", lo=0.0, hi=10.0, bins=10).collect()
    assert len(same) == 1
    assert same[0]["psi"] == 0.0 and same[0]["n_a"] == 100

    # hard shift: all mass moves to the top bin
    c = spark.createDataFrame([(9.5,)] * 100, "v double")
    shifted = psi_drift(a, c, "v", lo=0.0, hi=10.0, bins=10).collect()[0]
    assert shifted["psi"] > 0.25  # "major shift" band
    # closed-form check with the documented Laplace smoothing
    want = 0.0
    for i in range(10):
        p = (10 + 1) / (100 + 10)
        q = ((100 if i == 9 else 0) + 1) / (100 + 10)
        want += (p - q) * math.log(p / q)
    assert abs(shifted["psi"] - round(want, 6)) < 1e-9


def test_psi_drift_grouped_scaffold_counts_empty_bins(spark):
    from datacamp_etl_spark.operators.profile import psi_drift

    # group g2 exists only on side A: its side-B proportions are all
    # the smoothed 1/bins floor; PSI must still be finite and present
    a = spark.createDataFrame(
        [("g1", 1.0), ("g1", 2.0), ("g2", 3.0)], "g string, v double"
    )
    b = spark.createDataFrame([("g1", 1.0)], "g string, v double")
    out = {
        r["g"]: r
        for r in psi_drift(
            a, b, "v", lo=0.0, hi=4.0, bins=4, group_col="g"
        ).collect()
    }
    assert set(out) == {"g1", "g2"}
    assert out["g2"]["n_b"] == 0
    assert out["g2"]["psi"] is not None


def test_psi_drift_validates_bins(spark):
    from datacamp_etl_spark.operators.profile import psi_drift

    docs = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        psi_drift(docs, docs, "v", lo=0.0, hi=1.0, bins=1)


def test_release_engine_caches_sweeps_localcheckpoints(spark):
    from datacamp_etl_spark.operators.spread import release_engine_caches

    df = spark.range(1000).localCheckpoint()
    assert df.count() == 1000
    jsc = spark.sparkContext._jsc
    assert jsc.getPersistentRDDs().size() >= 1
    release_engine_caches()
    # every pinned block (scoped caches AND untracked localCheckpoint
    # blocks) must be gone — in a long-lived host leaked checkpoint
    # storage squeezes execution memory until sort-heavy queries spill
    assert jsc.getPersistentRDDs().size() == 0
    # the session stays fully usable after the sweep
    assert spark.range(5).count() == 5


# ---------------------------------------------------------------------
# dsir_weights / c4_rules / perplexity_buckets (round-8 stretch 2)
# ---------------------------------------------------------------------


def test_dsir_weights_ranks_target_like_docs_higher(spark):
    from pyspark.sql import functions as F

    from datacamp_etl_spark.operators.selection import dsir_weights

    rows = (
        [(i, "alpha beta gamma delta", 1) for i in range(10)]       # target
        + [(i, "alpha beta gamma epsilon", 0) for i in range(10, 14)]  # close
        + [(i, "zeta eta theta iota", 0) for i in range(14, 18)]    # far
        + [(18, "", 0)]                                             # empty
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, tgt int")
    out = {
        r["doc_id"]: r
        for r in dsir_weights(
            docs, F.col("tgt") == 1, buckets=64
        ).collect()
    }
    assert set(out) == set(range(19))  # EVERY pool doc reported
    close, far = out[10]["log_weight"], out[14]["log_weight"]
    assert close > far  # target-like text scores higher
    assert out[18]["n_feats"] == 0 and out[18]["log_weight"] == 0.0


def test_dsir_weights_validates_buckets(spark):
    from pyspark.sql import functions as F

    from datacamp_etl_spark.operators.selection import dsir_weights

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_weights(docs, F.lit(True), buckets=1)


def test_c4_rules_flags_and_keep(spark):
    from datacamp_etl_spark.operators.quality import c4_rules

    rows = [
        (1, "Good doc with words. More here! Really? yes indeed"),
        (2, "short. no"),                          # < 3 sentences
        (3, "Fine text lorem ipsum more. Two! Three? pad pad"),
        (4, "Code doc { x } one. Two! Three? pad pad"),
        (5, "Enable JavaScript to view. Two! Three? pad pad"),
        (6, "This site uses cookies ok. Two! Three? pad pad"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in c4_rules(docs).collect()}
    assert out[1]["keep"] == 1
    assert out[2]["keep"] == 0 and out[2]["n_sentences"] == 1
    assert out[3]["has_lorem_ipsum"] == 1 and out[3]["keep"] == 0
    assert out[4]["has_curly_brace"] == 1 and out[4]["keep"] == 0
    assert out[5]["has_javascript"] == 1 and out[5]["keep"] == 0
    assert out[6]["has_policy_phrase"] == 1 and out[6]["keep"] == 0


def test_perplexity_buckets_equal_bands_per_lang(spark):
    from collections import Counter

    from datacamp_etl_spark.operators.text import perplexity_buckets

    # 9 docs per lang, salted with a unique token so every doc has a
    # distinct bigram set (and >= 1 bigram)
    rows = [
        (lang_i * 100 + i, f"{lang} common word w{i} tail token", lang)
        for lang_i, lang in enumerate(["en", "fr"])
        for i in range(9)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(docs).collect()
    assert len(out) == 18
    for lang in ("en", "fr"):
        bands = Counter(r["band"] for r in out if r["lang"] == lang)
        assert bands == {"head": 3, "middle": 3, "tail": 3}
    # within a lang, every head score <= every tail score
    en = [r for r in out if r["lang"] == "en"]
    assert max(r["lm_score"] for r in en if r["band"] == "head") <= min(
        r["lm_score"] for r in en if r["band"] == "tail"
    )


# ---------------------------------------------------------------------
# sequential_poisson_sample (weighted sampling without replacement)
# ---------------------------------------------------------------------

def test_sps_selects_k_and_keys_are_u_over_w(spark):
    from datacamp_etl_spark.operators.mixture import (
        sample_bucket,
        sequential_poisson_sample,
    )
    import pyspark.sql.functions as F

    rows = [(i, (i % 7) + 1) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    out = sequential_poisson_sample(df, "w", 10, id_col="doc_id")
    got = out.collect()
    assert len(got) == 10
    # key really is (bucket+1)/w, and the selection is the k smallest
    keyed = df.select(
        "doc_id",
        ((sample_bucket("doc_id") + 1).cast("double") / F.col("w").cast("double")).alias("k"),
    ).collect()
    expect = sorted(keyed, key=lambda r: (r["k"], r["doc_id"]))[:10]
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in expect]


def test_sps_zero_and_null_weights_excluded_and_deterministic(spark):
    from datacamp_etl_spark.operators.mixture import sequential_poisson_sample

    df = spark.createDataFrame(
        [(1, 5), (2, 0), (3, None), (4, 5), (5, 5)], "doc_id long, w int"
    )
    out = sequential_poisson_sample(df, "w", 5, id_col="doc_id")
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {1, 4, 5}  # zero/NULL weight rows never drawn
    # same selection under a different physical layout
    again = sequential_poisson_sample(df.repartition(7), "w", 5, id_col="doc_id")
    assert {r["doc_id"] for r in again.collect()} == ids


def test_sps_weight_bias(spark):
    # with k = n/2, heavy rows must be selected at a visibly higher
    # rate than light rows (inclusion ~ proportional to weight)
    from datacamp_etl_spark.operators.mixture import sequential_poisson_sample

    rows = [(i, 10 if i % 2 == 0 else 1) for i in range(1, 401)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = sequential_poisson_sample(df, "w", 200, id_col="doc_id").collect()
    heavy = sum(1 for r in got if r["w"] == 10)
    assert heavy > 140  # 200 slots, heavy:light odds 10:1


# ---------------------------------------------------------------------
# source_minhash_overlap (corpus-overlap matrix)
# ---------------------------------------------------------------------

def test_source_overlap_orders_pairs_and_detects_overlap(spark):
    from datacamp_etl_spark.operators.dedup import source_minhash_overlap

    shared = "the quick brown fox jumps over the lazy dog again and again"
    rows = (
        [(i, shared + f" tail{i}", "A") for i in range(5)]
        + [(100 + i, shared + f" tail{i}", "B") for i in range(5)]
        + [(200 + i, f"totally different text number {i} with unique words w{i} q{i} z{i}", "C") for i in range(5)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {(r["source_a"], r["source_b"]): r["est_jaccard"]
           for r in source_minhash_overlap(df).collect()}
    assert set(out) == {("A", "B"), ("A", "C"), ("B", "C")}  # a < b only
    assert out[("A", "B")] > 0.9   # near-identical shingle sets
    assert out[("A", "C")] < 0.3   # disjoint content
    # estimates are exact multiples of 1/16
    assert all(abs(v * 16 - round(v * 16)) < 1e-9 for v in out.values())


def test_source_overlap_identical_groups_hit_one(spark):
    from datacamp_etl_spark.operators.dedup import source_minhash_overlap

    text = "alpha beta gamma delta epsilon zeta eta theta"
    df = spark.createDataFrame(
        [(1, text, "X"), (2, text, "Y")], "doc_id long, text string, source string"
    )
    [row] = source_minhash_overlap(df).collect()
    assert (row["source_a"], row["source_b"]) == ("X", "Y")
    assert row["est_jaccard"] == 1.0


# ---------------------------------------------------------------------
# quantile_sketch_contract
# ---------------------------------------------------------------------

def test_quantile_contract_holds_on_real_column(spark):
    from datacamp_etl_spark.operators.sketch import quantile_sketch_contract

    df = spark.range(1, 10_001).selectExpr("CAST(id AS DOUBLE) AS v")
    out = quantile_sketch_contract(df, "v", [0.5, 0.9, 0.99]).collect()
    assert [r["prob"] for r in out] == [0.5, 0.9, 0.99]
    assert all(r["within_contract"] for r in out)
    # exact percentile of 1..10000 at p is interpolated rank p*(n-1)+1
    by_p = {r["prob"]: r["exact_val"] for r in out}
    assert abs(by_p[0.5] - 5000.5) < 1e-6


def test_quantile_contract_flags_a_broken_sketch(spark, monkeypatch):
    # force the "sketch" to return garbage: the boolean must flip
    from datacamp_etl_spark.operators import sketch as sk

    df = spark.range(1, 1_001).selectExpr("CAST(id AS DOUBLE) AS v")
    monkeypatch.setattr(
        type(df), "approxQuantile", lambda self, c, ps, err: [1.0 for _ in ps]
    )
    out = sk.quantile_sketch_contract(df, "v", [0.9]).collect()
    assert not out[0]["within_contract"]


# ---------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------

def test_mad_outliers_flags_planted_spikes(spark):
    from datacamp_etl_spark.operators.profile import mad_outliers

    base = [(i, "g", 100.0 + (i % 11) / 10.0) for i in range(1, 101)]
    spikes = [(1001, "g", 10_000.0), (1002, "g", -10_000.0)]
    df = spark.createDataFrame(base + spikes, "id long, grp string, v double")
    [row] = mad_outliers(df, "v", "grp", id_col="id").collect()
    assert row["n"] == 102
    assert row["n_outliers"] == 2
    assert abs(row["median_val"] - 100.5) < 1.0
    assert row["mad"] > 0


def test_mad_outliers_null_values_ignored_and_zero_mad(spark):
    from datacamp_etl_spark.operators.profile import mad_outliers

    # constant group: MAD = 0, the lone deviant is the only outlier;
    # NULLs don't count toward n
    rows = [(i, "c", 5.0) for i in range(10)] + [(99, "c", 6.0), (100, "c", None)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    [row] = mad_outliers(df, "v", "grp", id_col="id").collect()
    assert row["n"] == 11
    assert row["mad"] == 0.0
    assert row["n_outliers"] == 1


# ---------------------------------------------------------------------
# length_bucket_batches / token_budget_cap (curation; registry entries
# planned for the next adjudication window)
# ---------------------------------------------------------------------

def test_length_bucket_batches_band_edges_and_density(spark):
    from datacamp_etl_spark.operators.curation import length_bucket_batches

    rows = [(i, int(t)) for i, t in enumerate(
        [10, 63, 64, 100, 127, 128, 300, 600, 2000, 65, 70, 80, 90]
    )]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = length_bucket_batches(df, "n_tokens", batch_size=3).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["band"] == 0 and by_id[1]["band"] == 0
    assert by_id[2]["band"] == 64 and by_id[4]["band"] == 64
    assert by_id[5]["band"] == 128 and by_id[6]["band"] == 256
    assert by_id[7]["band"] == 512 and by_id[8]["band"] == 1024
    # batch ids are dense 0..ceil(k/3)-1 within each band, never cross
    import collections
    per_band = collections.defaultdict(list)
    for r in out:
        per_band[r["band"]].append(r["batch_id"])
    for band, ids in per_band.items():
        counts = collections.Counter(ids)
        assert set(counts) == set(range(max(ids) + 1))
        assert all(c <= 3 for c in counts.values())
        # only the LAST batch may be partial
        assert sum(1 for c in counts.values() if c < 3) <= 1


def test_length_bucket_batches_layout_stable(spark):
    from datacamp_etl_spark.operators.curation import length_bucket_batches

    rows = [(i, 50 + i % 200) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    a = {(r["doc_id"]): (r["band"], r["batch_id"])
         for r in length_bucket_batches(df, "n_tokens", 8).collect()}
    b = {(r["doc_id"]): (r["band"], r["batch_id"])
         for r in length_bucket_batches(df.repartition(13), "n_tokens", 8).collect()}
    assert a == b


def test_token_budget_cap_prefix_and_budget(spark):
    from datacamp_etl_spark.operators.curation import token_budget_cap
    from datacamp_etl_spark.operators.curation import _order_hash
    import pyspark.sql.functions as F

    rows = [(i, "s", 100) for i in range(1, 21)]  # 20 docs x 100 tokens
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    out = token_budget_cap(df, "n_tokens", 550).collect()
    # 5 docs of 100 fit in 550; the 6th would overflow
    assert len(out) == 5
    assert max(r["cum_tokens"] for r in out) == 500
    # kept set is exactly the hash-order prefix
    ordered = [r["doc_id"] for r in df.select(
        "doc_id", _order_hash("doc_id").alias("h")).orderBy("h", "doc_id").collect()]
    assert {r["doc_id"] for r in out} == set(ordered[:5])


def test_token_budget_cap_per_group_independent(spark):
    from datacamp_etl_spark.operators.curation import token_budget_cap

    rows = [(i, "a", 60) for i in range(10)] + [(100 + i, "b", 10) for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    out = token_budget_cap(df, "n_tokens", 100).collect()
    got = {}
    for r in out:
        got.setdefault(r["source"], 0)
        got[r["source"]] += 1
    assert got == {"a": 1, "b": 10}  # 60<=100 but 120>100; 10x10=100 fits


def test_token_budget_cap_zero_budget_empty(spark):
    from datacamp_etl_spark.operators.curation import token_budget_cap

    df = spark.createDataFrame([(1, "s", 5)], "doc_id long, source string, n_tokens int")
    assert token_budget_cap(df, "n_tokens", 0).count() == 0


# ---------------------------------------------------------------------
# pagerank
# ---------------------------------------------------------------------

def test_pagerank_star_graph_center_dominates(spark):
    from datacamp_etl_spark.operators.graph import pagerank

    # spokes 1..5 all point at hub 0; hub is dangling
    edges = spark.createDataFrame([(i, 0) for i in range(1, 6)], "src long, dst long")
    ranks = {r["node"]: r["rank"] for r in pagerank(edges, iterations=20).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # mass conserved
    assert ranks[0] > 0.5  # hub absorbs the graph's authority
    spoke = [v for k, v in ranks.items() if k != 0]
    assert max(spoke) - min(spoke) < 1e-9  # symmetric spokes tie


def test_pagerank_cycle_is_uniform(spark):
    from datacamp_etl_spark.operators.graph import pagerank

    n = 6
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    ranks = [r["rank"] for r in pagerank(edges, iterations=15).collect()]
    assert all(abs(v - 1.0 / n) < 1e-9 for v in ranks)


def test_pagerank_matches_reference_power_iteration(spark):
    from datacamp_etl_spark.operators.graph import pagerank

    # small digraph incl. a dangling node (4) and a 2-cycle
    E = [(1, 2), (1, 3), (2, 3), (3, 1), (2, 4)]
    edges = spark.createDataFrame(E, "src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=30).collect()}

    # plain-python power iteration, same semantics
    nodes = sorted({x for e in E for x in e})
    N, d = len(nodes), 0.85
    out = {u: [v for (a, v) in E if a == u] for u in nodes}
    r = {u: 1.0 / N for u in nodes}
    for _ in range(30):
        dangling = sum(r[u] for u in nodes if not out[u])
        nr = {}
        for u in nodes:
            in_mass = sum(r[v] / len(out[v]) for v in nodes if u in out[v])
            nr[u] = (1 - d) / N + d * (dangling / N + in_mass)
        r = nr
    for u in nodes:
        assert abs(got[u] - r[u]) < 1e-9, (u, got[u], r[u])


# ---------------------------------------------------------------------
# Oracle-readiness parity: the three pytest-gated round-8 operators
# (length_bucket_batches, token_budget_cap, pagerank) replayed in
# DuckDB over the documents fixture, value-for-value. These are the
# exact SQL bodies their registry entries will carry in the next
# adjudication window — proving them hash-ready without consuming one
# of this round's 50 window slots (10 new + 40 stale veterans).
# ---------------------------------------------------------------------

_BUCKET_SQL = (
    "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), "
        f"{i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    ) + ")"
)


def _duck(sf_dir, sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).fetchall()


def test_length_bucket_batches_duckdb_parity(spark, sf_dir):
    from datacamp_etl_spark.operators.curation import length_bucket_batches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["band"], r["batch_id"])
        for r in length_bucket_batches(
            docs.withColumnRenamed("n_chars", "n_tokens"), "n_tokens", 32
        ).select("doc_id", "band", "batch_id").collect()
    )
    want = sorted(_duck(sf_dir, f"""
        WITH b AS (SELECT doc_id,
                     CASE WHEN n_chars >= 1024 THEN 1024
                          WHEN n_chars >= 512 THEN 512
                          WHEN n_chars >= 256 THEN 256
                          WHEN n_chars >= 128 THEN 128
                          WHEN n_chars >= 64 THEN 64 ELSE 0 END AS band,
                     {_BUCKET_SQL} AS h
                   FROM documents)
        SELECT doc_id, band,
               (row_number() OVER (PARTITION BY band ORDER BY h, doc_id) - 1)
                 // 32 AS batch_id
        FROM b
    """))
    assert got == want


def test_token_budget_cap_duckdb_parity(spark, sf_dir):
    from datacamp_etl_spark.operators.curation import token_budget_cap

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(
        (r["doc_id"], r["cum_tokens"])
        for r in token_budget_cap(
            docs.withColumnRenamed("n_chars", "n_tokens"),
            "n_tokens",
            50_000,
            group_col="source",
        ).select("doc_id", "cum_tokens").collect()
    )
    want = sorted(_duck(sf_dir, f"""
        WITH b AS (SELECT doc_id, source, n_chars, {_BUCKET_SQL} AS h
                   FROM documents),
        c AS (SELECT doc_id,
                     sum(n_chars) OVER (PARTITION BY source ORDER BY h, doc_id
                                        ROWS UNBOUNDED PRECEDING) AS cum
              FROM b)
        SELECT doc_id, CAST(cum AS BIGINT) FROM c WHERE cum <= 50000
    """))
    assert got == want


def test_pagerank_duckdb_parity_fixed_iterations(spark, sf_dir):
    """PageRank replayed as 3 chained CTE iterations in DuckDB over a
    deterministic edge list derived from documents (doc_id -> the
    smallest doc_id of its source, a star forest plus self-links
    filtered out) — float sums differ only in addend order, so compare
    at 9 decimals."""
    from datacamp_etl_spark.operators.graph import pagerank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    import pyspark.sql.functions as F
    from pyspark.sql import Window as W

    hub = docs.select(
        "doc_id",
        F.min("doc_id").over(W.partitionBy("source")).alias("hub"),
    ).where("doc_id <> hub")
    edges = hub.select(F.col("doc_id").alias("src"), F.col("hub").alias("dst"))
    got = {
        r["node"]: round(r["rank"], 9)
        for r in pagerank(edges, iterations=3).collect()
    }

    it = """
    SELECT n.node,
           (SELECT (1 - 0.85) / (SELECT count(*) FROM nodes)
                   + 0.85 * ((SELECT coalesce(sum(r.rank), 0) FROM {prev} r
                              LEFT JOIN deg ON deg.src = r.node
                              WHERE deg.src IS NULL)
                             / (SELECT count(*) FROM nodes))) 
           + 0.85 * coalesce((SELECT sum(p.rank / d.deg)
                              FROM edges e
                              JOIN {prev} p ON p.node = e.src
                              JOIN deg d ON d.src = e.src
                              WHERE e.dst = n.node), 0) AS rank
    FROM nodes n
    """
    sql = f"""
        WITH edges AS (
          SELECT doc_id AS src,
                 min(doc_id) OVER (PARTITION BY source) AS dst
          FROM documents
          QUALIFY doc_id <> dst),
        nodes AS (SELECT src AS node FROM edges
                  UNION SELECT dst FROM edges),
        deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
        r0 AS (SELECT node, 1.0 / (SELECT count(*) FROM nodes) AS rank
               FROM nodes),
        r1 AS ({it.format(prev='r0')}),
        r2 AS ({it.format(prev='r1')}),
        r3 AS ({it.format(prev='r2')})
        SELECT node, rank FROM r3
    """
    want = {n: round(v, 9) for n, v in _duck(sf_dir, sql)}
    assert set(got) == set(want)
    for n in got:
        assert abs(got[n] - want[n]) < 1e-9, (n, got[n], want[n])


# ---------------------------------------------------------------------
# row_band_signatures / streaming_near_dup_filter
# ---------------------------------------------------------------------

def test_row_band_signatures_match_batch_band_signatures(spark, sf_dir):
    import pyspark.sql.functions as F

    from datacamp_etl_spark.operators.dedup import (
        band_signatures,
        row_band_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    batch = {
        (r["doc_id"], r["band"]): r["band_sig"]
        for r in band_signatures(docs).collect()
    }
    per_row = docs.select(
        "doc_id", F.posexplode(row_band_signatures("text")).alias("band", "sig")
    ).collect()
    assert per_row  # fixture docs are long enough to shingle
    for r in per_row:
        assert batch[(r["doc_id"], r["band"])] == r["sig"]


def test_row_band_signatures_null_for_short_docs(spark):
    from datacamp_etl_spark.operators.dedup import row_band_signatures

    df = spark.createDataFrame([("a b",), ("",)], "text string")
    vals = [r[0] for r in df.select(row_band_signatures("text")).collect()]
    assert vals == [None, None]  # < k tokens -> no band keys, no collisions


def test_streaming_near_dup_filter_drops_corpus_dups(spark, tmp_path):
    from datacamp_etl_spark.operators.dedup import (
        band_signatures,
        incremental_dedup,
        streaming_near_dup_filter,
    )

    corpus_rows = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "training data pipelines need deduplication at every single stage"),
    ]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    index = band_signatures(corpus)

    new_rows = [
        # near-verbatim copy of corpus doc 1 -> must be dropped
        (10, "the quick brown fox jumps over the lazy dog near the river bank today"),
        # novel -> must pass
        (11, "completely unrelated sentence about databases and storage engines"),
        # too short to shingle -> passes by construction
        (12, "hi there"),
    ]
    src = str(tmp_path / "newdocs")
    spark.createDataFrame(new_rows, "doc_id long, text string").write.parquet(src)

    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    filtered = streaming_near_dup_filter(stream, index)
    q = (
        filtered.writeStream.format("memory")
        .queryName("nd_filter")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    survivors = {r["doc_id"] for r in spark.sql("SELECT * FROM nd_filter").collect()}
    assert survivors == {11, 12}

    # parity with the batch path (modulo the short doc, which the
    # batch path also keeps: it produces no band rows)
    batch_survivors = {
        r["doc_id"]
        for r in incremental_dedup(
            spark.createDataFrame(new_rows, "doc_id long, text string"), index
        ).collect()
    }
    assert batch_survivors == survivors


# ---------------------------------------------------------------------
# negative_pairs (deterministic contrastive negative sampling)
# ---------------------------------------------------------------------

def test_negative_pairs_shape_and_no_self_draws(spark):
    from datacamp_etl_spark.operators.ids import negative_pairs

    df = spark.createDataFrame([(i,) for i in range(1, 41)], "doc_id long")
    out = negative_pairs(df, 3).collect()
    assert len(out) == 40 * 3
    by_anchor = {}
    for r in out:
        assert r["negative_id"] != r["anchor_id"]  # ring step never 0
        by_anchor.setdefault(r["anchor_id"], set()).add(r["neg_rank"])
    assert all(v == {0, 1, 2} for v in by_anchor.values())


def test_negative_pairs_deterministic_across_layout(spark):
    from datacamp_etl_spark.operators.ids import negative_pairs

    df = spark.createDataFrame([(i,) for i in range(1, 101)], "doc_id long")
    a = sorted(map(tuple, negative_pairs(df, 2).collect()))
    b = sorted(map(tuple, negative_pairs(df.repartition(9), 2).collect()))
    assert a == b


def test_negative_pairs_draws_spread_over_corpus(spark):
    from datacamp_etl_spark.operators.ids import negative_pairs

    df = spark.createDataFrame([(i,) for i in range(1, 201)], "doc_id long")
    out = negative_pairs(df, 5).collect()
    distinct_negatives = {r["negative_id"] for r in out}
    # 1000 uniform draws over 200 ids: expect near-full coverage
    assert len(distinct_negatives) > 150


def test_negative_pairs_validates_k(spark):
    from datacamp_etl_spark.operators.ids import negative_pairs

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(ValueError):
        negative_pairs(df, 0)


# ---------------------------------------------------------------------
# review-fix contracts (round-8 self-review)
# ---------------------------------------------------------------------

def test_length_bucket_batches_drops_below_floor_and_null(spark):
    from datacamp_etl_spark.operators.curation import length_bucket_batches

    rows = [(1, 50), (2, 150), (3, None), (4, 250)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens int")
    out = length_bucket_batches(df, "n_tokens", 2, edges=[100, 200]).collect()
    got = {r["doc_id"]: r["band"] for r in out}
    assert got == {2: 100, 4: 200}  # below-floor and NULL rows dropped


def test_token_budget_cap_null_tokens_dropped(spark):
    from datacamp_etl_spark.operators.curation import token_budget_cap

    rows = [(1, "s", None), (2, "s", 40), (3, "s", 40), (4, "s", 40)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens int")
    out = token_budget_cap(df, "n_tokens", 80).collect()
    ids = {r["doc_id"] for r in out}
    assert 1 not in ids           # NULL cost: dropped, never poisons
    assert len(ids) == 2          # exactly 80 tokens of the rest fit
    assert all(r["cum_tokens"] <= 80 for r in out)


def test_negative_pairs_single_row_raises(spark):
    from datacamp_etl_spark.operators.ids import negative_pairs

    df = spark.createDataFrame([(1,)], "doc_id long")
    with pytest.raises(Exception, match="negative_pairs needs >= 2 rows"):
        negative_pairs(df, 1).collect()


def test_quantile_contract_empty_column_returns_no_rows(spark):
    from datacamp_etl_spark.operators.sketch import quantile_sketch_contract

    df = spark.createDataFrame([], "v double")
    out = quantile_sketch_contract(df, "v", [0.5])
    assert out.count() == 0
    assert out.columns == ["prob", "exact_val", "within_contract"]


def test_pagerank_empty_edges_returns_empty(spark):
    from datacamp_etl_spark.operators.graph import pagerank

    edges = spark.createDataFrame([], "src long, dst long")
    out = pagerank(edges, iterations=2)
    assert out.count() == 0
    assert set(out.columns) == {"node", "rank"}


def test_negative_pairs_duckdb_parity(spark, sf_dir):
    """negative_pairs replayed in DuckDB over the documents fixture —
    the exact SQL its registry entry will carry next round: positions
    by row_number over (md5(id), id), ring step from md5(anchor:j)."""
    from datacamp_etl_spark.operators.ids import negative_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    got = sorted(map(tuple, negative_pairs(docs, 2).collect()))

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    fold = " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}"
        for i in range(8)
    )
    want = sorted(
        map(
            tuple,
            con.execute(f"""
        WITH pos AS (SELECT doc_id,
                       row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                          doc_id) - 1 AS p,
                       count(*) OVER () AS n
                     FROM documents),
        drawn AS (SELECT doc_id AS anchor_id, p, n, j.neg_rank
                  FROM pos CROSS JOIN (VALUES (0), (1)) AS j(neg_rank)),
        stepped AS (SELECT anchor_id, neg_rank, n,
                      (p + 1 + (SELECT {fold} FROM (SELECT md5(CAST(anchor_id AS VARCHAR)
                          || ':' || CAST(neg_rank AS VARCHAR)) AS h)) % (n - 1)
                      ) % n AS neg_pos
                    FROM drawn)
        SELECT s.anchor_id, CAST(s.neg_rank AS BIGINT), pos.doc_id AS negative_id
        FROM stepped s JOIN pos ON pos.p = s.neg_pos
        """).fetchall(),
        )
    )
    assert got == want


# ---------------------------------------------------------------------
# ivfpq_rerank (exact refine stage on the ADC shortlist)
# ---------------------------------------------------------------------

def test_ivfpq_rerank_full_probe_matches_exact_topk(spark, sf_dir):
    """With every cell probed and shortlist = corpus, the refine stage
    degenerates to exact brute-force: results must match
    brute_force_topk row-for-row."""
    from datacamp_etl_spark.operators.pq import ivfpq_rerank
    from datacamp_etl_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    query = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    got = ivfpq_rerank(
        emb, query, topk=10, shortlist=n, num_cells=8, num_probes=8
    ).collect()
    want = brute_force_topk(emb, query, k=10).collect()
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
    assert got[0]["vec_id"] == want[0]["vec_id"]
    for g, w in zip(got, want):
        assert abs(g["cos_sim"] - w["cosine"]) < 1e-6


def test_ivfpq_rerank_subset_of_shortlist_and_exact_order(spark, sf_dir):
    from datacamp_etl_spark.operators.pq import ivfpq_rerank, ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    query = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    short_ids = {
        r["vec_id"]
        for r in ivfpq_topk(emb, query, topk=30, num_probes=2).collect()
    }
    got = ivfpq_rerank(
        emb, query, topk=10, shortlist=30, num_probes=2
    ).collect()
    assert len(got) == 10
    assert {r["vec_id"] for r in got} <= short_ids  # refine never invents
    sims = [r["cos_sim"] for r in got]
    assert sims == sorted(sims, reverse=True)  # exact order, best first


def test_ivfpq_rerank_drops_zero_norm_and_validates_shortlist(spark):
    from datacamp_etl_spark.operators.pq import ivfpq_rerank

    rows = [(i, [float(i + j) for j in range(8)]) for i in range(8)] + [
        (100 + i, [0.0] * 8) for i in range(4)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivfpq_rerank(
        df, [1.0] * 8, topk=10, shortlist=12, num_cells=4, num_probes=4,
        m=4, k=2,
    ).collect()
    ids = [r["vec_id"] for r in out]
    assert all(i < 100 for i in ids)  # zero-norm rows never fill a slot
    assert len(ids) == 8              # only the scoreable rows
    with pytest.raises(ValueError, match="shortlist"):
        ivfpq_rerank(df, [1.0] * 8, topk=10, shortlist=5)


# ---------------------------------------------------------------------
# rolling_distinct / robust_scale (staged for the next window)
# ---------------------------------------------------------------------

def test_rolling_distinct_window_semantics(spark):
    from datacamp_etl_spark.operators.timeseries import rolling_distinct

    rows = [
        ("2024-01-01 10:00:00", 1), ("2024-01-01 11:00:00", 1),  # dup same day
        ("2024-01-02 10:00:00", 2),
        ("2024-01-05 10:00:00", 1),
        # gap: 2024-01-03 / 04 have no events
    ]
    df = spark.createDataFrame(rows, "ts string, user_id long").selectExpr(
        "CAST(ts AS TIMESTAMP) AS ts", "user_id"
    )
    out = {str(r["day"]): r["n_distinct"]
           for r in rolling_distinct(df, "ts", "user_id", window_days=3).collect()}
    assert out == {
        "2024-01-01": 1,          # {1}
        "2024-01-02": 2,          # {1, 2}
        "2024-01-03": 2,          # window 01-03: {1, 2}
        "2024-01-04": 1,          # window 02-04: {2}  (gap day still defined)
        "2024-01-05": 1,          # window 03-05: {1}
    }


def test_rolling_distinct_duckdb_parity(spark, sf_dir):
    from datacamp_etl_spark.queries import t
    from datacamp_etl_spark.operators.timeseries import rolling_distinct

    ev = t(spark, sf_dir, "events")
    got = sorted(
        (str(r["day"]), r["n_distinct"])
        for r in rolling_distinct(ev, "ts", "user_id", window_days=7).collect()
    )
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    want = sorted(
        (str(d), int(n))
        for d, n in con.execute("""
        WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS du, user_id
                       FROM events),
        spine AS (SELECT unnest(generate_series(min(du), max(du),
                         INTERVAL 1 DAY))::DATE AS day FROM pairs),
        c AS (SELECT du + INTERVAL (j.j) DAY AS day, user_id
              FROM pairs CROSS JOIN (SELECT unnest(range(7)) AS j) j)
        SELECT s.day, count(DISTINCT c.user_id) AS n
        FROM spine s LEFT JOIN c ON c.day = s.day
        GROUP BY s.day
        """).fetchall()
    )
    assert got == want


def test_rolling_distinct_plan_has_no_bnlj(spark, sf_dir):
    from datacamp_etl_spark.queries import t
    from datacamp_etl_spark.operators.timeseries import rolling_distinct

    df = rolling_distinct(t(spark, sf_dir, "events"), "ts", "user_id")
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in phys
    assert "CartesianProduct" not in phys


def test_robust_scale_composes_with_mad_outliers(spark):
    from datacamp_etl_spark.operators.profile import robust_scale

    base = [(i, "g", float(i)) for i in range(1, 10)] + [
        (99, "g", 1000.0), (100, "g", None),
    ]
    # 10 values 1..9 + 1000: median 5.5, MAD 2.5
    df = spark.createDataFrame(base, "id long, grp string, v double")
    out = {r["id"]: r["robust_z"] for r in
           robust_scale(df, "v", "grp", id_col="id").collect()}
    assert out[100] is None                # NULL measurement -> NULL score
    assert out[99] > 3.5                   # the planted spike scores huge
    assert abs(out[4] + out[7]) < 1e-9     # symmetric around the median
    assert abs(out[5] - (-0.5 / (1.4826 * 2.5))) < 1e-6  # closed form


def test_robust_scale_zero_mad_is_null(spark):
    from datacamp_etl_spark.operators.profile import robust_scale

    df = spark.createDataFrame(
        [(i, "c", 5.0) for i in range(5)], "id long, grp string, v double"
    )
    out = robust_scale(df, "v", "grp", id_col="id").collect()
    assert all(r["robust_z"] is None for r in out)  # constant group: no scale


def test_mad_and_robust_scale_exclude_null_groups_consistently(spark):
    from datacamp_etl_spark.operators.profile import mad_outliers, robust_scale

    rows = [(1, "g", 1.0), (2, "g", 2.0), (3, "g", 3.0), (4, None, 9.0)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    groups = {r["grp"] for r in mad_outliers(df, "v", "grp", id_col="id").collect()}
    assert groups == {"g"}  # a NULL key names no group
    out = {r["id"]: r["robust_z"]
           for r in robust_scale(df, "v", "grp", id_col="id").collect()}
    assert out[4] is None           # same exclusion, NULL score
    assert out[2] == 0.0            # real group still scales


def test_robust_scale_small_scale_features_not_zeroed(spark):
    # the stats are UNROUNDED: a 1e-6-scale feature must still scale
    from datacamp_etl_spark.operators.profile import robust_scale

    rows = [(i, "g", i * 1e-6) for i in range(1, 10)]
    df = spark.createDataFrame(rows, "id long, grp string, v double")
    out = {r["id"]: r["robust_z"]
           for r in robust_scale(df, "v", "grp", id_col="id").collect()}
    assert out[5] == 0.0
    assert out[9] is not None and out[9] > 1.0  # not NULLed by rounding
