"""Round-9 operators: within-document repetition detection
(intra_doc_repeats / intra_doc_repeat_fraction) and the unigram-LM
tokenizer (see test additions below as they land)."""

from __future__ import annotations

import pytest


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
