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
