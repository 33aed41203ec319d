"""Round-9 operators: within-document repetition detection
(intra_doc_repeats / intra_doc_repeat_fraction) and the unigram-LM
tokenizer (see test additions below as they land)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _repeats(spark, rows, min_tokens=4):
    from datacamp_etl_spark.operators.dedup import intra_doc_repeats

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return intra_doc_repeats(docs, min_tokens=min_tokens).collect()


def test_second_occurrence_found_and_maximal(spark):
    # a 6-token passage repeats once inside one doc; with k=4 the
    # repeated copy yields 3 overlapping repeated window starts that
    # must merge into ONE maximal span covering exactly the copy
    p = "one two three four five six"
    rows = [(1, f"{p} alpha beta gamma delta {p}")]
    out = _repeats(spark, rows)
    assert len(out) == 1
    [r] = out
    # first copy = tokens 0..5, filler 6..9, second copy starts at 10
    assert (r["span_start"], r["span_len"]) == (10, 6)


def test_first_occurrence_never_reported(spark):
    # keep-first: a doc whose passage appears once has no repeats
    rows = [(1, "one two three four five unique tail words here")]
    assert _repeats(spark, rows) == []


def test_cross_doc_duplicates_are_not_intra(spark):
    # the same passage in TWO different docs is substring_dedup's
    # business, not this operator's
    p = "one two three four five"
    rows = [(1, f"{p} alpha beta"), (2, f"gamma {p} delta")]
    assert _repeats(spark, rows) == []


def test_two_separate_repeats_stay_separate(spark):
    s1, s2 = "one two three four", "five six seven eight"
    rows = [(1, f"{s1} {s2} aa bb cc dd ee {s1} ff gg hh ii jj {s2}")]
    out = sorted(_repeats(spark, rows), key=lambda r: r["span_start"])
    assert [(r["span_start"], r["span_len"]) for r in out] == [
        (13, 4),
        (22, 4),
    ]
    # each span's cluster is the md5 of its own text -> distinct here
    assert out[0]["cluster"] != out[1]["cluster"]


def test_cluster_matches_cross_doc_key_space(spark):
    # an intra-doc span over the same text as a cross-doc span carries
    # the same cluster key (both are md5 of the normalized span text)
    from datacamp_etl_spark.operators.dedup import substring_dedup

    p = "one two three four"
    intra = _repeats(spark, [(1, f"{p} xx yy zz ww {p}")])
    cross_rows = [(1, f"{p} aaa bbb"), (2, f"ccc {p} ddd")]
    docs = spark.createDataFrame(cross_rows, "doc_id long, text string")
    cross = substring_dedup(docs, min_tokens=4).collect()
    assert intra[0]["cluster"] in {r["cluster"] for r in cross}


def test_periodic_text_keeps_only_first_period(spark):
    # (A)*3 with |A| = k: window starts 0..3 are first occurrences
    # (each rotation of A appears first inside the leading period);
    # every start >= 4 repeats the start 4 positions earlier -> one
    # span covering exactly the 2nd and 3rd periods
    period = "a b c d"
    rows = [(1, f"{period} {period} {period}")]
    [r] = _repeats(spark, rows)
    assert (r["span_start"], r["span_len"]) == (4, 8)


def test_short_period_text_collapses_to_first_window(spark):
    # period 1 ("a" * 12): all windows are identical, so every start
    # after 0 is repeated -> everything but the first token is covered
    rows = [(1, " ".join(["a"] * 12))]
    [r] = _repeats(spark, rows)
    assert (r["span_start"], r["span_len"]) == (1, 11)


def test_min_tokens_validated(spark):
    with pytest.raises(ValueError):
        _repeats(spark, [(1, "a b c")], min_tokens=1)


def test_fraction_covers_all_docs(spark):
    from datacamp_etl_spark.operators.dedup import intra_doc_repeat_fraction

    p = "one two three four"
    rows = [
        (1, f"{p} xx yy zz ww {p}"),            # 4 of 12 tokens repeated
        (2, "all distinct words in this doc"),  # 0 of 6
        (3, ""),                                # zero tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in intra_doc_repeat_fraction(docs, min_tokens=4).collect()
    }
    assert set(out) == {1, 2, 3}
    assert (out[1]["n_tokens"], out[1]["repeat_tokens"]) == (12, 4)
    assert out[1]["repeat_fraction"] == pytest.approx(4 / 12, abs=1e-6)
    assert out[2]["repeat_tokens"] == 0 and out[2]["repeat_fraction"] == 0.0
    assert out[3]["n_tokens"] == 0 and out[3]["repeat_fraction"] == 0.0


def test_plan_shape(spark, sf_dir):
    """Scale posture: anchors meet only inside their own (doc, hash)
    partition — no cartesian, no BNLJ; islands window is doc-keyed."""
    from datacamp_etl_spark.queries import QUERIES

    df = QUERIES["intra_doc_repeat_fraction"](spark, sf_dir)
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys


# ---------------------------------------------------------------------
# unigram-LM tokenizer (Kudo 2018 / SentencePiece family)
# ---------------------------------------------------------------------


def test_unigram_word_prefers_low_cost_path():
    from datacamp_etl_spark.operators.bpe import unigram_word

    # 'abc' as one piece is cheaper than any composition
    cost = {"a": 10, "b": 10, "c": 10, "ab": 15, "abc": 12}
    assert unigram_word("abc", cost, 3) == ["abc"]
    # without the whole-word piece, 'ab'+'c' (25) beats a+b+c (30)
    cost2 = {"a": 10, "b": 10, "c": 10, "ab": 15}
    assert unigram_word("abc", cost2, 3) == ["ab", "c"]


def test_unigram_word_tie_breaks_fewest_then_longest():
    from datacamp_etl_spark.operators.bpe import unigram_word

    # equal total cost (20): 'ab'+'cd' (2 tokens) must beat
    # 'a'+'b'+'cd' (3 tokens, cost 20 too)
    cost = {"a": 5, "b": 5, "ab": 10, "cd": 10}
    assert unigram_word("abcd", cost, 2) == ["ab", "cd"]
    # equal cost AND equal token count: prefer the LONGER last piece
    # 'a'+'bcd' vs 'ab'+'cd' both cost 20, 2 tokens -> 'bcd' wins
    cost2 = {"a": 10, "ab": 10, "bcd": 10, "cd": 10}
    assert unigram_word("abcd", cost2, 3) == ["a", "bcd"]


def test_unigram_word_unseen_char_is_whole_word_unk():
    from datacamp_etl_spark.operators.bpe import unigram_word

    cost = {"a": 1, "b": 1}
    assert unigram_word("axb", cost, 2) == ["[UNK]"]


def test_unigram_word_long_word_cap():
    from datacamp_etl_spark.operators.bpe import (
        UNIGRAM_MAX_WORD_CHARS,
        unigram_word,
    )

    cost = {"a": 1}
    # at the cap: 63 single-char pieces — ntok exactly fills the
    # packed key's 6-bit field, segmentation still exact
    at_cap = "a" * UNIGRAM_MAX_WORD_CHARS
    assert unigram_word(at_cap, cost, 1) == ["a"] * UNIGRAM_MAX_WORD_CHARS
    # beyond the cap (hash/base64-style runs): whole-word [UNK]
    # rather than a DP whose ntok would carry into the cost field
    assert unigram_word(at_cap + "a", cost, 1) == ["[UNK]"]
    assert unigram_word("a" * 100, cost, 1) == ["[UNK]"]


def test_unigram_train_chars_survive_and_words_segment(spark):
    from datacamp_etl_spark.operators.bpe import unigram_train, unigram_word

    rows = [(i, "banana bandana cabana") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pieces = unigram_train(docs, vocab_size=8)
    vocab = {p for p, _ in pieces}
    # every corpus character survives pruning
    assert {"a", "b", "c", "d", "n"} <= vocab
    cost = dict(pieces)
    ml = max(len(p) for p in cost)
    for w in ("banana", "bandana", "cabana"):
        toks = unigram_word(w, cost, ml)
        assert toks != ["[UNK]"]
        assert "".join(toks) == w  # plain-substring round-trip


def test_unigram_fixture_matches_training(spark):
    """FIXTURE_UNIGRAM_V1 is unigram_train(sf0.001 documents,
    vocab_size=44) frozen as a literal; re-derive it so the pinned
    copy (and the oracle embedding it) cannot rot."""
    from datacamp_etl_spark.operators.bpe import (
        FIXTURE_UNIGRAM_V1,
        unigram_train,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert unigram_train(docs, vocab_size=44) == FIXTURE_UNIGRAM_V1


def test_unigram_encode_counts_and_roundtrip(spark):
    from datacamp_etl_spark.operators.bpe import (
        FIXTURE_UNIGRAM_V1,
        unigram_encode,
    )

    rows = [
        (1, "window scan window"),
        (2, "zzz"),         # unseen char z -> whole-word UNK
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in unigram_encode(docs, FIXTURE_UNIGRAM_V1).collect()}
    assert out[1]["n_words"] == 3 and out[1]["n_unk"] == 0
    assert out[1]["tokens_str"] == "window scan window"
    assert out[2]["n_unk"] == 1 and out[2]["tokens_str"] == "[UNK]"
    assert out[3]["n_words"] == 0 and out[3]["tokens_str"] == ""


def test_unigram_encode_layout_deterministic(spark):
    from datacamp_etl_spark.operators.bpe import (
        FIXTURE_UNIGRAM_V1,
        unigram_encode,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, unigram_encode(docs, FIXTURE_UNIGRAM_V1).collect()))
    b = sorted(
        map(
            tuple,
            unigram_encode(docs.repartition(7), FIXTURE_UNIGRAM_V1).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------------
# remove_spans / substring_dedup_apply (the CUT half of span dedup)
# ---------------------------------------------------------------------


def test_remove_spans_cuts_exact_ranges(spark):
    from datacamp_etl_spark.operators.dedup import remove_spans

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y z")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [(1, 2, 3)], "doc_id long, span_start int, span_len int"
    )
    out = {r["doc_id"]: r for r in remove_spans(docs, spans).collect()}
    assert out[1]["cleaned_text"] == "a b f g h"
    assert (out[1]["n_tokens"], out[1]["n_removed"]) == (8, 3)
    # span-free doc passes through normalized, 0 removed
    assert out[2]["cleaned_text"] == "x y z"
    assert out[2]["n_removed"] == 0


def test_remove_spans_multiple_disjoint_spans(spark):
    from datacamp_etl_spark.operators.dedup import remove_spans

    docs = spark.createDataFrame(
        [(1, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")], "doc_id long, text string"
    )
    spans = spark.createDataFrame(
        [(1, 0, 2), (1, 5, 3)], "doc_id long, span_start int, span_len int"
    )
    [r] = remove_spans(docs, spans).collect()
    assert r["cleaned_text"] == "t2 t3 t4 t8 t9"
    assert r["n_removed"] == 5


def test_substring_dedup_apply_keeps_first_occurrence(spark):
    from datacamp_etl_spark.operators.dedup import substring_dedup_apply

    p = "one two three four five six"
    rows = [
        (1, f"alpha beta {p} gamma delta"),
        (2, f"zeta {p} eta theta iota"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in substring_dedup_apply(docs, min_tokens=4).collect()
    }
    # doc 1 holds the cluster's first occurrence -> untouched
    assert out[1]["n_removed"] == 0
    assert out[1]["cleaned_text"] == f"alpha beta {p} gamma delta"
    # doc 2's copy is cut
    assert out[2]["n_removed"] == 6
    assert out[2]["cleaned_text"] == "zeta eta theta iota"


def test_substring_dedup_apply_reports_every_doc(spark):
    from datacamp_etl_spark.operators.dedup import substring_dedup_apply

    rows = [(1, "totally unique text one"), (2, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in substring_dedup_apply(docs).collect()}
    assert set(out) == {1, 2}
    assert out[1]["n_removed"] == 0
    assert out[2]["n_tokens"] == 0 and out[2]["cleaned_text"] == ""


def test_intra_apply_composes_with_intra_repeats(spark):
    from datacamp_etl_spark.operators.dedup import (
        intra_doc_repeats,
        remove_spans,
    )

    p = "one two three four"
    docs = spark.createDataFrame(
        [(1, f"{p} aa bb cc dd {p}")], "doc_id long, text string"
    )
    spans = intra_doc_repeats(docs, min_tokens=4).select(
        "doc_id", "span_start", "span_len"
    )
    [r] = remove_spans(docs, spans).collect()
    assert r["cleaned_text"] == f"{p} aa bb cc dd"
    assert r["n_removed"] == 4


# ---------------------------------------------------------------------
# ks_drift / anomaly_zscore / kmv_set_ops / event_transitions
# ---------------------------------------------------------------------


def test_ks_drift_identical_and_disjoint(spark):
    from datacamp_etl_spark.operators.profile import ks_drift

    a = spark.createDataFrame(
        [("g", float(v)) for v in (1, 2, 3, 4)], "grp string, v double"
    )
    # same sample -> D = 0
    [r] = ks_drift(a, a, "v", group_col="grp").collect()
    assert (r["n_a"], r["n_b"], r["ks_d"]) == (4, 4, 0.0)
    # disjoint supports -> D = 1
    b = spark.createDataFrame(
        [("g", float(v)) for v in (10, 11)], "grp string, v double"
    )
    [r] = ks_drift(a, b, "v", group_col="grp").collect()
    assert (r["n_a"], r["n_b"], r["ks_d"]) == (4, 2, 1.0)


def test_ks_drift_known_value(spark):
    from datacamp_etl_spark.operators.profile import ks_drift

    # F_a jumps to 1 at 1,2; F_b at 2,3 -> sup gap at v in [1,2) is
    # |1/2 - 0| ... exact D = 1/2
    a = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    b = spark.createDataFrame([(2.0,), (3.0,)], "v double")
    [r] = ks_drift(a, b, "v").collect()
    assert r["ks_d"] == 0.5


def test_anomaly_zscore_flags_spike_only(spark):
    from datacamp_etl_spark.operators.timeseries import anomaly_zscore

    # 10 steady readings then one spike; lookback covers the steady
    # run, so only the spike row is flagged (constant history ->
    # zero variance -> any deviation flags)
    rows = [(1, i, 5.0) for i in range(10)] + [(1, 10, 50.0)]
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    out = anomaly_zscore(
        df, "k", ["seq"], "v", lookback=20, min_history=8
    ).collect()
    assert [(r["seq"], r["direction"]) for r in out] == [(10, "high")]


def test_anomaly_zscore_respects_min_history_and_threshold(spark):
    from datacamp_etl_spark.operators.timeseries import anomaly_zscore

    # same spike but only 5 rows of history -> below min_history,
    # nothing flagged
    rows = [(1, i, 5.0) for i in range(5)] + [(1, 5, 50.0)]
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    assert (
        anomaly_zscore(df, "k", ["seq"], "v", min_history=8).count() == 0
    )
    # noisy-but-inside readings are not flagged: alternating 4/6 has
    # stdev 1, value 6 is z=1 from mean 5
    rows = [(1, i, 4.0 + (i % 2) * 2) for i in range(12)]
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    assert anomaly_zscore(df, "k", ["seq"], "v").count() == 0


def test_anomaly_zscore_low_direction(spark):
    from datacamp_etl_spark.operators.timeseries import anomaly_zscore

    rows = [(1, i, 100.0 + (i % 2)) for i in range(10)] + [(1, 10, 1.0)]
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    out = anomaly_zscore(df, "k", ["seq"], "v").collect()
    assert [(r["seq"], r["direction"]) for r in out] == [(10, "low")]


def test_anomaly_zscore_large_magnitudes_no_overflow(spark):
    # regression: with scale=100 and |v| ~ 3.1e7, x*x ~ 9.6e18 exceeds
    # int64, so BIGINT window sums raised ARITHMETIC_OVERFLOW under
    # ANSI (or silently mis-flagged). The DECIMAL(38,0) identity must
    # survive and flag exactly the spike.
    from datacamp_etl_spark.operators.timeseries import anomaly_zscore

    base = 3.1e7
    rows = [(1, i, base + (i % 2)) for i in range(10)] + [
        (1, 10, 2 * base)
    ]
    df = spark.createDataFrame(rows, "k long, seq long, v double")
    out = anomaly_zscore(df, "k", ["seq"], "v").collect()
    assert [(r["seq"], r["direction"]) for r in out] == [(10, "high")]


def test_kmv_set_ops_exact_below_k(spark):
    from datacamp_etl_spark.operators.sketch import kmv_set_ops

    # below k the sketches are the full hash sets -> every estimate
    # is EXACT: |A|=60, |B|=60, |A ∩ B| = 20 (ids 40..59)
    rows = [("a", i) for i in range(60)] + [("b", i) for i in range(40, 100)]
    df = spark.createDataFrame(rows, "g string, u long")
    [r] = kmv_set_ops(df, "g", "u", k=256).collect()
    assert (r["group_a"], r["group_b"]) == ("a", "b")
    assert (r["est_a"], r["est_b"], r["est_union"]) == (60, 60, 100)
    assert r["est_intersection"] == 20
    assert r["jaccard"] == 0.2


def test_kmv_set_ops_pairs_and_nulls(spark):
    from datacamp_etl_spark.operators.sketch import kmv_set_ops

    rows = (
        [("a", i) for i in range(10)]
        + [("b", i) for i in range(10)]
        + [("c", 999)]
        + [(None, 1), ("a", None)]
    )
    df = spark.createDataFrame(rows, "g string, u long")
    out = {
        (r["group_a"], r["group_b"]): r
        for r in kmv_set_ops(df, "g", "u", k=64).collect()
    }
    # 3 groups -> 3 ordered pairs; NULL group/value rows dropped
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[("a", "b")]["jaccard"] == 1.0
    assert out[("a", "c")]["est_intersection"] == 0


def test_event_transitions_counts_and_probs(spark):
    from datacamp_etl_spark.operators.funnel import event_transitions

    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # user 1: A -> B -> A -> C ; user 2: A -> B
    for u, seq in ((1, "ABAC"), (2, "AB")):
        for i, ev in enumerate(seq):
            rows.append((u * 100 + i, t0 + dt.timedelta(minutes=i), u, ev))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {
        (r["prev_type"], r["next_type"]): r
        for r in event_transitions(df).collect()
    }
    assert out[("A", "B")]["n"] == 2
    assert out[("A", "C")]["n"] == 1
    assert out[("B", "A")]["n"] == 1
    # A's outgoing: 2x ->B, 1x ->C
    assert out[("A", "B")]["p_next"] == round(2 / 3, 6)
    assert out[("A", "C")]["p_next"] == round(1 / 3, 6)
    assert out[("B", "A")]["p_next"] == 1.0
    # no cross-user transition (user 2's B has no successor)
    assert ("C", "A") not in out and len(out) == 3


# ---------------------------------------------------------------------
# image dHash: BMP pipeline, resize path, pigeonhole banding
# ---------------------------------------------------------------------


def test_dhash_known_gradient_image(spark):
    from datacamp_etl_spark.operators.multimodal import (
        _encode_bmp,
        image_dhash,
    )

    # strictly decreasing rows -> every horizontal gradient bit is 1
    rows = [[255 - c * 30 for c in range(8)] for _ in range(8)]
    media = spark.createDataFrame(
        [(1, "image", None, bytearray(_encode_bmp(rows)))],
        "media_id long, kind string, mime string, content binary",
    )
    [r] = image_dhash(media).collect()
    assert r["dhash"] == (1 << 56) - 1
    # strictly increasing -> all zero
    rows = [[c * 30 for c in range(8)] for _ in range(8)]
    media = spark.createDataFrame(
        [(2, "image", None, bytearray(_encode_bmp(rows)))],
        "media_id long, kind string, mime string, content binary",
    )
    [r] = image_dhash(media).collect()
    assert r["dhash"] == 0


def test_dhash_resizes_larger_images(spark):
    from datacamp_etl_spark.operators.multimodal import (
        _encode_bmp,
        image_dhash,
    )

    # 32x16 image whose 8x8 nearest-neighbor downsample is the same
    # gradient -> same signature as the 8x8 original (scale
    # invariance, the property dHash exists for)
    small = [[255 - c * 30 for c in range(8)] for _ in range(8)]
    big = [
        [255 - (c * 8 // 32) * 30 for c in range(32)] for _ in range(16)
    ]
    media = spark.createDataFrame(
        [
            (1, "image", None, bytearray(_encode_bmp(small))),
            (2, "image", None, bytearray(_encode_bmp(big))),
        ],
        "media_id long, kind string, mime string, content binary",
    )
    out = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    assert out[1] == out[2]


def test_dhash_near_pairs_matches_brute_force(spark):
    from datacamp_etl_spark.operators.multimodal import (
        dhash_near_pairs,
        image_dhash,
        synthetic_bmp_media,
    )

    docs = spark.range(0, 120).select(F.col("id").alias("doc_id"))
    sig = image_dhash(synthetic_bmp_media(docs))
    banded = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in dhash_near_pairs(sig, max_hamming=4, bands=7).collect()
    }
    rows = sig.collect()
    brute = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1:]:
            ham = bin(a["dhash"] ^ b["dhash"]).count("1")
            if ham <= 4:
                x, y = sorted((a["media_id"], b["media_id"]))
                brute.add((x, y, ham))
    assert banded == brute and len(brute) > 0


def test_dhash_near_pairs_rejects_bad_params(spark):
    from datacamp_etl_spark.operators.multimodal import dhash_near_pairs

    sig = spark.createDataFrame([(1, 0)], "media_id long, dhash long")
    with pytest.raises(ValueError):
        dhash_near_pairs(sig, max_hamming=7, bands=7)
    with pytest.raises(ValueError):
        dhash_near_pairs(sig, bands=5)


# ---------------------------------------------------------------------
# pmi_collocations / trend_slope
# ---------------------------------------------------------------------


def test_pmi_perfect_collocation(spark):
    import math

    from datacamp_etl_spark.operators.text import pmi_collocations

    # "new york" always adjacent, never apart; filler pairs vary.
    docs = spark.createDataFrame(
        [(i, "new york " + f"tok{i} filler") for i in range(6)],
        "doc_id long, text string",
    )
    out = {
        (r["w1"], r["w2"]): r
        for r in pmi_collocations(docs, min_count=5).collect()
    }
    # margins over bigram events: 18 bigrams total; new->york 6 of 6
    # lefts of 'new', 6 of 6 rights of 'york'
    [key] = list(out)
    assert key == ("new", "york") and out[key]["n"] == 6
    assert out[key]["pmi"] == round(math.log(18 * 6 / (6 * 6)), 6)


def test_pmi_min_count_filters(spark):
    from datacamp_etl_spark.operators.text import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c d")], "doc_id long, text string"
    )
    out = pmi_collocations(docs, min_count=2).collect()
    assert [(r["w1"], r["w2"], r["n"]) for r in out] == [("a", "b", 2)]


def test_trend_slope_exact_line(spark):
    import datetime as dt

    from datacamp_etl_spark.operators.timeseries import trend_slope

    # daily totals 10, 20, 30, 40 -> slope exactly 10/day
    rows = [
        ("g", dt.datetime(2024, 1, 1 + i, 12, 0), 10.0 * (i + 1))
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    [r] = trend_slope(df, "ts", "v", "k").collect()
    assert (r["n_days"], r["slope"]) == (4, 10.0)


def test_trend_slope_single_day_null_and_grouping(spark):
    import datetime as dt

    from datacamp_etl_spark.operators.timeseries import trend_slope

    rows = [
        ("one", dt.datetime(2024, 1, 1), 5.0),
        ("flat", dt.datetime(2024, 1, 1), 7.0),
        ("flat", dt.datetime(2024, 1, 2), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r["k"]: r for r in trend_slope(df, "ts", "v", "k").collect()}
    assert out["one"]["slope"] is None and out["one"]["n_days"] == 1
    assert out["flat"]["slope"] == 0.0


def test_trend_slope_sums_within_day(spark):
    import datetime as dt

    from datacamp_etl_spark.operators.timeseries import trend_slope

    # two readings per day; the regression runs on DAILY TOTALS
    rows = [
        ("g", dt.datetime(2024, 1, 1, h), 1.0) for h in (1, 2)
    ] + [
        ("g", dt.datetime(2024, 1, 2, h), 2.0) for h in (1, 2)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    [r] = trend_slope(df, "ts", "v", "k").collect()
    assert r["slope"] == 2.0  # totals 2 -> 4


# ---------------------------------------------------------------------
# luhn_scan
# ---------------------------------------------------------------------


def test_luhn_accepts_valid_rejects_invalid(spark):
    from datacamp_etl_spark.operators.pii import luhn_scan

    rows = [
        # classic test numbers: Visa valid, off-by-one invalid
        (1, "pay 4111 1111 1111 1111 now"),
        (2, "pay 4111 1111 1111 1112 now"),
        # separators mixed; Amex 15-digit valid number
        (3, "amex 3782-822463 10005 ok"),
        # too short / too long digit runs are not candidates
        (4, "short 4111 1111 1111 and long 11111111111111111111111"),
        (5, "no digits at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in luhn_scan(df).collect()}
    assert (out[1]["n_candidates"], out[1]["n_valid"]) == (1, 1)
    assert (out[2]["n_candidates"], out[2]["n_valid"]) == (1, 0)
    assert (out[3]["n_candidates"], out[3]["n_valid"]) == (1, 1)
    assert out[4]["n_valid"] == 0
    assert (out[5]["n_candidates"], out[5]["n_valid"]) == (0, 0)


def test_luhn_counts_multiple_candidates(spark):
    from datacamp_etl_spark.operators.pii import luhn_scan

    df = spark.createDataFrame(
        [(1, "a 4111111111111111 b 5500005555555559 c 1234567890123")],
        "doc_id long, text string",
    )
    [r] = luhn_scan(df).collect()
    # two valid cards + one 13-digit junk run that fails the checksum
    assert (r["n_candidates"], r["n_valid"]) == (3, 2)


# ---------------------------------------------------------------------
# cluster_balanced_sample
# ---------------------------------------------------------------------


def test_cluster_balanced_quota_and_determinism(spark):
    from datacamp_etl_spark.operators.similarity import (
        cluster_balanced_sample,
    )

    # two well-separated blobs of different sizes; quota flattens them
    rows = [(i, [0.0, 0.0 + (i % 7) * 0.01]) for i in range(40)] + [
        (100 + i, [10.0, 10.0 + (i % 5) * 0.01]) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_balanced_sample(
        df, k=2, n_iter=2, per_cluster=5
    ).collect()
    by_cluster: dict[int, list] = {}
    for r in out:
        by_cluster.setdefault(r["cluster"], []).append(r)
    # every cluster capped at the quota; the small blob (8 >= 5) also
    # fills its quota, so the 5x-denser blob has NO extra weight
    assert sorted(len(v) for v in by_cluster.values()) == [5, 5]
    assert all(1 <= r["pick_rank"] <= 5 for r in out)
    # deterministic: same picks on re-run
    again = cluster_balanced_sample(
        df, k=2, n_iter=2, per_cluster=5
    ).collect()
    assert {(r["vec_id"], r["cluster"]) for r in out} == {
        (r["vec_id"], r["cluster"]) for r in again
    }


def test_cluster_balanced_small_cluster_keeps_all(spark):
    from datacamp_etl_spark.operators.similarity import (
        cluster_balanced_sample,
    )

    rows = [(i, [0.0, float(i % 3)]) for i in range(6)] + [
        (50, [9.0, 9.0]), (51, [9.0, 9.1])
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cluster_balanced_sample(df, k=2, n_iter=2, per_cluster=10)
    counts = {
        r["cluster"]: r["n"]
        for r in out.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    }
    assert sum(counts.values()) == 8  # below quota -> everything kept


# ---------------------------------------------------------------------
# redact_valid_cards / key_skew_report
# ---------------------------------------------------------------------


def test_redact_only_valid_cards(spark):
    from datacamp_etl_spark.operators.pii import redact_valid_cards

    rows = [
        (1, "ok 4111 1111 1111 1111 bad 4111 1111 1111 1112 end"),
        (2, "clean text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_valid_cards(df).collect()}
    assert out[1]["n_redacted"] == 1
    assert out[1]["text"] == "ok <CARD> bad 4111 1111 1111 1112 end"
    assert out[2]["n_redacted"] == 0 and out[2]["text"] == "clean text"


def test_redact_replaces_every_occurrence(spark):
    from datacamp_etl_spark.operators.pii import redact_valid_cards

    df = spark.createDataFrame(
        [(1, "a 4111111111111111 b 4111111111111111")],
        "doc_id long, text string",
    )
    [r] = redact_valid_cards(df).collect()
    assert r["text"] == "a <CARD> b <CARD>"
    assert r["n_redacted"] == 2  # both candidate instances validated


def test_redact_never_rewrites_substring_of_longer_digit_run(spark):
    # regression: a valid card that ALSO occurs as a substring of a
    # longer non-candidate digit run (a 20+-digit identifier) must
    # only be redacted at its standalone occurrence — literal replace
    # used to corrupt the identifier too.
    from datacamp_etl_spark.operators.pii import redact_valid_cards

    card = "4111111111111111"
    ident = "9999" + card + "77"  # 22-digit identifier containing it
    df = spark.createDataFrame(
        [(1, f"pay {card} ref {ident} done")],
        "doc_id long, text string",
    )
    [r] = redact_valid_cards(df).collect()
    assert r["text"] == f"pay <CARD> ref {ident} done"
    assert r["n_redacted"] == 1


def test_key_skew_report_exact_stats(spark):
    from datacamp_etl_spark.operators.skew import key_skew_report

    # keys: a=6, b=2, c=1, d=1 -> n_rows=10, n_keys=4
    rows = [("a",)] * 6 + [("b",)] * 2 + [("c",), ("d",)]
    df = spark.createDataFrame(rows, "k string")
    [r] = key_skew_report(df, ["k"], top_k=2).collect()
    assert (r["n_rows"], r["n_keys"], r["max_n"]) == (10, 4, 6)
    # counts sorted: [1,1,2,6]; p50 = 1.5 interpolated
    assert r["p50"] == 1.5
    assert r["top_share"] == 0.8  # (6+2)/10


# ---------------------------------------------------------------------
# contract pins from the round-9 self-review
# ---------------------------------------------------------------------


def test_ks_drift_one_sided_group_is_null(spark):
    """A group present in only one snapshot has no defined KS
    statistic: both engines return NULL via the divide-by-zero ->
    NULL contract (verified identical in DuckDB)."""
    from datacamp_etl_spark.operators.profile import ks_drift

    a = spark.createDataFrame(
        [("only_a", 1.0), ("both", 2.0)], "grp string, v double"
    )
    b = spark.createDataFrame([("both", 2.0)], "grp string, v double")
    out = {r["grp"]: r for r in ks_drift(a, b, "v", group_col="grp").collect()}
    assert out["only_a"]["ks_d"] is None and out["only_a"]["n_b"] == 0
    assert out["both"]["ks_d"] == 0.0


def test_kmv_set_ops_saturated_estimates_reasonable(spark):
    from datacamp_etl_spark.operators.sketch import kmv_set_ops

    # k=64 sketches over 5000-element sets with 50% overlap: the
    # estimates must land within the sketch's design tolerance
    # (~1/sqrt(k) ~ 12.5%; allow 3x for one draw)
    rows = [("a", i) for i in range(5000)] + [
        ("b", i) for i in range(2500, 7500)
    ]
    df = spark.createDataFrame(rows, "g string, u long")
    [r] = kmv_set_ops(df, "g", "u", k=64).collect()
    assert abs(r["est_union"] - 7500) / 7500 < 0.375
    assert abs(r["est_a"] - 5000) / 5000 < 0.375
    # jaccard true = 2500/7500
    assert abs(r["jaccard"] - 1 / 3) < 0.25


def test_event_transitions_null_type_contract(spark):
    """NULL event types: a transition OUT of a NULL-typed event keeps
    prev_type NULL; a transition INTO a NULL-typed event is dropped —
    lead() = NULL is indistinguishable from end-of-sequence, and the
    operator treats both as "no successor" (documented contract, same
    filter in the SQL oracle)."""
    import datetime as dt

    from datacamp_etl_spark.operators.funnel import event_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "A"),
        (2, t0 + dt.timedelta(minutes=1), 1, None),
        (3, t0 + dt.timedelta(minutes=2), 1, "B"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = {(r["prev_type"], r["next_type"]) for r in event_transitions(df).collect()}
    assert out == {(None, "B")}


# ---------------------------------------------------------------------
# label_propagation
# ---------------------------------------------------------------------


def test_lpa_two_cliques_converge(spark):
    from datacamp_etl_spark.operators.graph import label_propagation

    # two triangles bridged by nothing: communities = {1,2,3}, {7,8,9}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (7, 8), (8, 9), (7, 9)],
        "src long, dst long",
    )
    out = {r["node"]: r["label"] for r in label_propagation(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 9: 7}


def test_lpa_star_does_not_oscillate(spark):
    from datacamp_etl_spark.operators.graph import label_propagation

    # pure synchronous LPA flips hub<->spokes forever on a star; the
    # retention vote must converge it (hub 0 = smallest id wins), and
    # the result must be identical for consecutive iteration budgets
    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 8)], "src long, dst long"
    )
    for it in (2, 3, 4):
        out = {
            r["node"]: r["label"]
            for r in label_propagation(edges, iterations=it).collect()
        }
        assert set(out.values()) == {0}, (it, out)


def test_lpa_finds_density_split_inside_one_component(spark):
    from datacamp_etl_spark.operators.graph import label_propagation

    # two 4-cliques joined by ONE bridge edge: connected components
    # would merge everything; LPA keeps two communities
    def clique(ids):
        return [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]

    edges = spark.createDataFrame(
        clique([1, 2, 3, 4]) + clique([11, 12, 13, 14]) + [(4, 11)],
        "src long, dst long",
    )
    out = {r["node"]: r["label"] for r in label_propagation(edges, iterations=4).collect()}
    assert {out[n] for n in (1, 2, 3, 4)} == {1}
    assert {out[n] for n in (11, 12, 13, 14)} == {11}


# ---------------------------------------------------------------------
# cusum_changepoint
# ---------------------------------------------------------------------


def test_cusum_locates_level_shift(spark):
    import datetime as dt

    from datacamp_etl_spark.operators.timeseries import cusum_changepoint

    # 10 days at 10.0, then 10 days at 30.0 -> |S_t| peaks at the
    # last pre-shift day (day 10)
    rows = [
        ("g", dt.datetime(2024, 1, 1 + i), 10.0 if i < 10 else 30.0)
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    [r] = cusum_changepoint(df, "ts", "v", "k").collect()
    assert r["n_days"] == 20
    assert str(r["cp_day"]) == "2024-01-10"
    # S_10 = 10*(10 - 20) = -100 -> |S| = 100
    assert r["cusum_stat"] == 100.0


def test_cusum_stable_series_small_stat(spark):
    import datetime as dt

    from datacamp_etl_spark.operators.timeseries import cusum_changepoint

    rows = [
        ("g", dt.datetime(2024, 1, 1 + i), 5.0) for i in range(15)
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    [r] = cusum_changepoint(df, "ts", "v", "k").collect()
    assert r["cusum_stat"] == 0.0  # constant series: S_t == 0 exactly


def test_cusum_single_day_group(spark):
    import datetime as dt

    from datacamp_etl_spark.operators.timeseries import cusum_changepoint

    df = spark.createDataFrame(
        [("g", dt.datetime(2024, 1, 1), 7.0)],
        "k string, ts timestamp, v double",
    )
    [r] = cusum_changepoint(df, "ts", "v", "k").collect()
    assert (r["n_days"], r["cusum_stat"]) == (1, 0.0)


# ---------------------------------------------------------------------
# session_paths
# ---------------------------------------------------------------------


def test_session_paths_respects_gap(spark):
    import datetime as dt

    from datacamp_etl_spark.operators.funnel import session_paths

    t0 = dt.datetime(2024, 1, 1)
    # A-B-C inside one session; D after a 2-hour gap starts a new
    # session, so no path crosses the gap
    rows = [
        (1, t0, 7, "A"),
        (2, t0 + dt.timedelta(minutes=5), 7, "B"),
        (3, t0 + dt.timedelta(minutes=10), 7, "C"),
        (4, t0 + dt.timedelta(hours=3), 7, "D"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = session_paths(df, gap_minutes=30, min_count=1).collect()
    assert [(r["p1"], r["p2"], r["p3"], r["n"]) for r in out] == [
        ("A", "B", "C", 1)
    ]


def test_session_paths_counts_across_users(spark):
    import datetime as dt

    from datacamp_etl_spark.operators.funnel import session_paths

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in (1, 2, 3):
        for i, ev in enumerate("XYZ"):
            rows.append((eid, t0 + dt.timedelta(minutes=i), u, ev))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    out = session_paths(df, gap_minutes=30, min_count=3).collect()
    assert [(r["p1"], r["p2"], r["p3"], r["n"]) for r in out] == [
        ("X", "Y", "Z", 3)
    ]
    # min_count above the corpus count -> empty
    assert session_paths(df, gap_minutes=30, min_count=4).count() == 0


# ---------------------------------------------------------------------
# quantile_normalize / funnel_latency
# ---------------------------------------------------------------------


def test_quantile_normalize_exact_scores(spark):
    from datacamp_etl_spark.operators.profile import quantile_normalize

    rows = [(1, "g", 10.0), (2, "g", 20.0), (3, "g", 20.0), (4, "g", 40.0),
            (5, "h", 1.0)]
    df = spark.createDataFrame(rows, "id long, g string, v double")
    out = {r["id"]: r for r in
           quantile_normalize(df, "v", ["id"], group_col="g").collect()}
    # group g, n=4: scores below/(n-1); ties share their min-rank
    assert out[1]["q_score"] == 0.0
    assert out[2]["q_score"] == round(1 / 3, 6)
    assert out[3]["q_score"] == round(1 / 3, 6)
    assert out[4]["q_score"] == 1.0
    # singleton group: no spread -> NULL
    assert out[5]["q_score"] is None


def test_quantile_normalize_null_value_passthrough(spark):
    from datacamp_etl_spark.operators.profile import quantile_normalize

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 6.0)], "id long, v double"
    )
    out = {r["id"]: r for r in
           quantile_normalize(df, "v", ["id"]).collect()}
    assert out[2]["q_score"] is None
    assert (out[1]["q_score"], out[3]["q_score"]) == (0.0, 1.0)


def test_funnel_latency_known_deltas(spark):
    import datetime as dt

    from datacamp_etl_spark.operators.funnel import funnel_latency

    t0 = dt.datetime(2024, 1, 1)

    def ev(eid, mins, u, typ):
        return (eid, t0 + dt.timedelta(minutes=mins), u, typ)

    rows = [
        ev(1, 0, 1, "signup"), ev(2, 10, 1, "purchase"),
        ev(3, 20, 1, "purchase"),              # later; min delta = 600 s
        ev(4, 0, 2, "signup"), ev(5, 30, 2, "purchase"),
        ev(6, 0, 3, "signup"),                 # never converts
        ev(7, 0, 4, "purchase"),               # converts without signup
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    [r] = funnel_latency(df, "signup", "purchase").collect()
    assert (r["n_entered"], r["n_converted"]) == (3, 2)
    # deltas: 600, 1800 -> p50 = 1200 interpolated, p90 = 1680
    assert r["p50_s"] == 1200.0
    assert r["p90_s"] == 1680.0


def test_funnel_latency_ignores_pre_entry_conversions(spark):
    import datetime as dt

    from datacamp_etl_spark.operators.funnel import funnel_latency

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "purchase"),                      # BEFORE signup
        (2, t0 + dt.timedelta(minutes=5), 1, "signup"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    [r] = funnel_latency(df, "signup", "purchase").collect()
    assert (r["n_entered"], r["n_converted"]) == (1, 0)
    assert r["p50_s"] is None
