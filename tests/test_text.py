"""Text-analysis operators [EXT]."""

from __future__ import annotations

import hashlib

from datacamp_etl_spark.operators import text as X


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "The quick brown Fox, jumps!  Over the lazy dog."),
            (2, "der hund und die katze ist mit für von nicht ein gut"),
            (3, ""),
            (4, "12345 !!!"),
        ],
        "doc_id long, text string",
    )


def test_normalize_and_tokens(spark):
    df = _docs(spark).select("doc_id", X.normalize_text("text").alias("n"),
                             X.token_count("text").alias("tc"))
    rows = {r["doc_id"]: r for r in df.collect()}
    assert rows[1]["n"] == "the quick brown fox jumps over the lazy dog"
    assert rows[1]["tc"] == 9
    assert rows[3]["n"] == ""
    assert rows[3]["tc"] == 0
    assert rows[4]["n"] == "12345"
    assert rows[4]["tc"] == 1


def test_language_id(spark):
    df = _docs(spark).select("doc_id", X.language_id("text").alias("lang"))
    rows = {r["doc_id"]: r["lang"] for r in df.collect()}
    assert rows[1] == "en"
    assert rows[2] == "de"
    assert rows[3] == "und"   # no tokens -> undetermined
    assert rows[4] == "und"


def test_fingerprint_matches_md5_of_normalized(spark):
    df = _docs(spark).select("doc_id", X.fingerprint("text").alias("fp"))
    rows = {r["doc_id"]: r["fp"] for r in df.collect()}
    expected = hashlib.md5(b"the quick brown fox jumps over the lazy dog").hexdigest()
    assert rows[1] == expected


def test_quality_scores(spark):
    df = _docs(spark)
    out = df.select("doc_id", *[c.alias(n) for n, c in X.quality_score("text").items()])
    rows = {r["doc_id"]: r for r in out.collect()}
    r1 = rows[1]
    assert r1["n_tokens"] == 9
    # 'the' twice + 'over' not in list... stopwords: the, the -> 2/9
    assert float(r1["stopword_ratio"]) == round(2 / 9, 4)
    assert rows[3]["stopword_ratio"] is None
    assert 0 < float(r1["alpha_ratio"]) <= 1


def test_profile_on_real_documents(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    prof = X.text_profile(docs.limit(50))
    rows = prof.collect()
    assert all(r["fingerprint"] is not None for r in rows)
    assert all(r["n_tokens"] > 0 for r in rows)
    assert all(r["n_tokens_bpe"] >= r["n_tokens"] for r in rows)


def test_chunk_text_windows_and_overlap(spark):
    from datacamp_etl_spark.operators.text import chunk_text

    toks = [f"w{i}" for i in range(10)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        (r["chunk_no"], r["n_tokens"], r["chunk"])
        for r in chunk_text(df, chunk_tokens=4, overlap=2).collect()
    )
    # stride 2: starts 0,2,4,6 (ceil((10-4)/2)+1 = 4 chunks)
    assert [r[0] for r in rows] == [0, 1, 2, 3]
    assert rows[0][2] == "w0 w1 w2 w3"
    assert rows[1][2] == "w2 w3 w4 w5"
    assert rows[3][2] == "w6 w7 w8 w9"
    assert all(r[1] == 4 for r in rows)


def test_chunk_text_short_doc_single_chunk(spark):
    from datacamp_etl_spark.operators.text import chunk_text

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    rows = chunk_text(df, chunk_tokens=4, overlap=2).collect()
    assert len(rows) == 1 and rows[0]["chunk"] == "a b" and rows[0]["n_tokens"] == 2


def test_bigram_lm_scores_exact_micro(spark):
    """Hand-computed add-one bigram LM on a 2-doc corpus."""
    import math

    from datacamp_etl_spark.operators.text import bigram_lm_scores

    # corpus: doc1 = "a b a b" (bigrams ab, ba, ab); doc2 = "a c"
    # (bigram ac); doc3 = "solo" (no bigram, but its token counts
    # toward the vocabulary). vocab = {a, b, c, solo} -> V = 4.
    # contexts: c1(a) = 3 (ab, ab, ac), c1(b) = 1 (ba)
    # bigrams:  c2(a,b) = 2, c2(b,a) = 1, c2(a,c) = 1
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert 3 not in out  # single-token doc has no bigram
    ab = math.log(3 + 4) - math.log(2 + 1)
    ba = math.log(1 + 4) - math.log(1 + 1)
    ac = math.log(3 + 4) - math.log(1 + 1)
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["lm_score"] - round((ab + ba + ab) / 3, 6)) < 1e-9
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["lm_score"] - round(ac, 6)) < 1e-9


def test_bigram_lm_scores_orders_boilerplate_below_salad(spark):
    """Predictable repeated text scores lower than unique token salad."""
    from datacamp_etl_spark.operators.text import bigram_lm_scores

    rep = " ".join(["the quick brown fox"] * 10)
    salad = " ".join(f"tok{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, rep), (2, salad)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r["lm_score"] for r in bigram_lm_scores(df).collect()}
    assert out[1] < out[2]


def test_sentence_stats_shapes(spark):
    from datacamp_etl_spark.operators.text import sentence_stats

    df = spark.createDataFrame(
        [
            (1, "One two. Three four five! Six?"),
            (2, ""),                      # 0 sentences, NULL stats
            (3, "no terminal punct here"),  # trailing segment counts
            (4, "Multi   space.  Next."),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in sentence_stats(df).collect()}
    assert out[1]["n_sentences"] == 3
    assert out[1]["max_sentence_tokens"] == 3
    assert abs(out[1]["avg_sentence_tokens"] - (2 + 3 + 1) / 3) < 1e-9
    assert out[2]["n_sentences"] == 0
    assert out[2]["avg_sentence_tokens"] is None
    assert out[3]["n_sentences"] == 1
    assert out[3]["max_sentence_tokens"] == 4
    assert out[4]["n_sentences"] == 2
    assert out[4]["max_sentence_tokens"] == 2
