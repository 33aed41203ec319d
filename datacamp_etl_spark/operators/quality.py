"""Corpus-quality operators for training-data pipelines [EXT].

Two families a large-scale pretraining pipeline runs on every corpus:

- **Benchmark contamination**: flag corpus documents that share word
  k-grams with an evaluation/benchmark set (the GPT-3/PaLM-style
  n-gram overlap check). The benchmark side is an eval suite —
  bounded by construction — so its distinct shingle set broadcasts;
  the corpus side is one scan + one explode, no self-join anywhere.
- **Repetition profiling**: the Gopher/C4-style within-document
  repetition signals (duplicate-token ratio, most-frequent-token
  share, duplicate-bigram ratio) used to drop boilerplate and
  degenerate pages. Entirely per-row array math — zero shuffles; at
  100 TB it runs inside the scan stage.

All ratios are DECIMAL (exact, engine-portable); no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacamp_etl_spark.operators.dedup import shingles
from datacamp_etl_spark.operators.spread import (
    ensure_parallelism,
    evaluate_once,
    scoped_cache,
)
from datacamp_etl_spark.operators.text import STOPWORDS, tokens

__all__ = [
    "contamination_check",
    "contamination_apply",
    "repetition_profile",
    "boilerplate_ratio",
    "gopher_rules",
    "c4_rules",
    "readability_scores",
]


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """Per corpus document: how many of its distinct word ``k``-grams
    appear anywhere in the benchmark set.

    Returns ``(id, n_shingles, n_contaminated, contamination_ratio,
    is_contaminated)`` for every corpus doc that has at least one
    shingle (shorter docs can't be k-gram contaminated by
    construction).

    Scale shape: the benchmark's distinct-shingle set is broadcast
    (eval suites are a bounded few million n-grams even for large
    benchmark collections); the corpus is a single scan -> explode ->
    broadcast-hash semi-match -> groupBy(id). No shuffle touches the
    raw text, only (id, shingle) pairs, and the contaminated subset is
    tiny. A left join + count of matches (rather than a semi-join)
    keeps zero-hit docs in one pass.
    """
    corpus = ensure_parallelism(corpus)  # shingling is CPU-bound
    # evaluate the shingle array once per row (size + explode would
    # otherwise each recompute it — CollapseProject inlines projections)
    c_arr = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(F.array(shingles(text_col, k))).alias("__sh"),
    )
    c_sh = c_arr.select(
        "id",
        F.size("__sh").alias("n_shingles"),
        F.explode("__sh").alias("shingle"),
    )
    b_sh = (
        benchmark.select(F.explode(shingles(text_col, k)).alias("shingle"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    return (
        c_sh.join(F.broadcast(b_sh), on="shingle", how="left")
        .groupBy("id", "n_shingles")
        .agg(F.sum(F.coalesce("__hit", F.lit(0))).alias("n_contaminated"))
        .withColumn(
            "contamination_ratio",
            (
                F.col("n_contaminated").cast("decimal(18,2)")
                / F.col("n_shingles")
            ).cast("decimal(18,4)"),
        )
        .withColumn(
            "is_contaminated", F.col("n_contaminated") >= F.lit(min_hits)
        )
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            "contamination_ratio",
            "is_contaminated",
        )
    )


def contamination_apply(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    min_hits: int = 1,
) -> DataFrame:
    """The decontamination APPLY step: the corpus minus every document
    :func:`contamination_check` flags (``n_contaminated >= min_hits``).

    Documents too short to carry a ``k``-gram are kept — they cannot
    be k-gram contaminated by construction (same rule as the check).

    Scale shape: the check's broadcast-semi pipeline produces the
    (tiny) flagged-id set; removal is ONE left-anti join on the id —
    the corpus rows never shuffle their text. This is the operator a
    pretraining pipeline actually ships: benchmark in, clean corpus
    out.
    """
    flagged = (
        contamination_check(
            corpus, benchmark, id_col, text_col, k=k, min_hits=min_hits
        )
        .where(F.col("is_contaminated"))
        .select(id_col)
    )
    return corpus.join(flagged, id_col, "left_anti")


def repetition_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Within-document repetition signals, one row per document:

    - ``n_tokens`` / ``n_distinct_tokens`` and the duplicate-token
      ratio ``1 - distinct/n``
    - ``top_token_frac``: share of the single most frequent token
      (boilerplate pages repeat one token heavily)
    - ``dup_bigram_frac``: ``1 - distinct_bigrams/n_bigrams`` (the
      C4/Gopher duplicate n-gram filter at n=2)

    Every signal is computed row-locally from the token array with
    JVM higher-order functions (``transform``/``filter``/
    ``array_max``) — a narrow projection with no shuffle; the
    most-frequent-token count is O(distinct x n) per row, bounded and
    embarrassingly parallel. Ratios are DECIMAL for engine-portable
    exactness.

    The token array is evaluated ONCE per row behind a Generate
    barrier (``evaluate_once``); letting CollapseProject inline the
    tokenization into each of the six signals measured 6x slower at
    sf0.1.
    """
    base = evaluate_once(
        ensure_parallelism(df), {"__toks": tokens(text_col)}
    )
    toks = F.col("__toks")
    n_tok = F.size(toks)
    m = F.greatest(n_tok - 1, F.lit(0))
    # second barrier: the distinct-token and bigram arrays each feed
    # two signals below — materialize them once per row too
    base = evaluate_once(
        base,
        {
            "__dis": F.array_distinct(toks),
            "__big": F.zip_with(
                F.slice(toks, 1, m),
                F.when(n_tok >= 2, F.slice(toks, 2, m)).otherwise(
                    F.array().cast("array<string>")
                ),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        },
    )
    dis = F.col("__dis")
    big = F.col("__big")
    n_dis = F.size(dis)
    top_cnt = F.array_max(
        F.transform(
            dis, lambda x: F.size(F.filter(toks, lambda y: y == x))
        )
    )
    n_big = F.size(big)
    n_big_dis = F.size(F.array_distinct(big))

    def _ratio(num, den):
        return F.when(
            den > 0,
            (num.cast("decimal(18,2)") / den).cast("decimal(18,4)"),
        )

    return base.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        n_dis.cast("long").alias("n_distinct_tokens"),
        _ratio(n_tok - n_dis, n_tok).alias("dup_token_ratio"),
        _ratio(F.coalesce(top_cnt, F.lit(0)), n_tok).alias("top_token_frac"),
        _ratio(n_big - n_big_dis, n_big).alias("dup_bigram_frac"),
    )


def boilerplate_ratio(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    k: int = 3,
    min_docs: int = 20,
    decimals: int = 6,
) -> DataFrame:
    """Cross-document boilerplate signal (the CCNet/C4 idea at shingle
    granularity): a word ``k``-shingle is boilerplate when it appears
    in at least ``min_docs`` distinct documents; each document is
    scored by the fraction of its distinct shingles that are
    boilerplate. High ratios mark template/menu/footer-heavy pages a
    curation pass should drop or strip.

    Returns ``(id, n_shingles, n_boiler, boiler_ratio)`` for documents
    with at least one shingle. Shape at scale: the shingle index is
    exploded once (shingles() is distinct per doc, so ``count(*)`` per
    shingle IS the document frequency — one map-side-combinable
    aggregation), the boilerplate set is re-joined by shingle key, and
    the final fold is doc-keyed. No windows, no UDFs, no driver
    materialization.
    """
    sh = scoped_cache(
        ensure_parallelism(df).select(
            F.col(id_col).alias("id"),
            F.explode(shingles(text_col, k)).alias("shingle"),
        )
    )
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    boiler = dfreq.where(F.col("df") >= min_docs).select(
        "shingle", F.lit(1).alias("__b")
    )
    marked = sh.join(boiler, "shingle", "left")
    return (
        marked.groupBy("id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(F.coalesce(F.col("__b"), F.lit(0))).alias("n_boiler"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_shingles").cast("long"),
            F.col("n_boiler").cast("long"),
            F.round(F.col("n_boiler") / F.col("n_shingles"), decimals).alias(
                "boiler_ratio"
            ),
        )
    )


def gopher_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len_milli: int = 3_000,
    max_mean_word_len_milli: int = 10_000,
    max_symbol_milli: int = 100,
    max_bullet_milli: int = 900,
    max_ellipsis_milli: int = 300,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule-battery document filter: the published
    heuristics a pretraining curation pass applies before any model-
    based scoring — word-count bounds, mean-word-length bounds,
    symbol-to-word ratio, bullet-line and ellipsis-line fractions, and
    a minimum number of distinct stopwords present.

    All signals are EXACT integer arithmetic (ratios are reported in
    thousandths via integer division) so the result is bit-identical
    across engines — no float division anywhere. Per-row column
    kernels only: zero shuffles, zero UDFs; at 100 TB the whole
    battery runs inside the scan stage and the ``keep`` predicate can
    be pushed into a downstream filter.

    Returns ``(id, n_words, mean_word_len_milli, symbol_milli,
    bullet_milli, ellipsis_milli, n_stop_distinct, keep)`` with
    ``keep`` as int 0/1.
    """
    c = F.col(text_col)
    toks = tokens(text_col)
    lines = F.split(c, "\n")
    is_bullet = lambda l: (  # noqa: E731
        F.ltrim(l).startswith("-")
        | F.ltrim(l).startswith("*")
        | F.ltrim(l).startswith("•")
    )
    is_ellipsis = lambda l: F.rtrim(l).endswith("...") | F.rtrim(  # noqa: E731
        l
    ).endswith("…")
    n_sym = F.size(
        F.regexp_extract_all(c, F.lit(r"#|\.\.\.|…"), 0)
    )
    stop_hits = None
    for w in STOPWORDS:
        hit = F.array_contains(toks, w).cast("int")
        stop_hits = hit if stop_hits is None else stop_hits + hit
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("bigint").alias("n_words"),
        F.length(F.concat_ws("", toks)).cast("bigint").alias("__tot_len"),
        F.size(lines).cast("bigint").alias("__n_lines"),
        F.size(F.filter(lines, is_bullet)).cast("bigint").alias("__n_bullet"),
        F.size(F.filter(lines, is_ellipsis))
        .cast("bigint")
        .alias("__n_ellipsis"),
        n_sym.cast("bigint").alias("__n_sym"),
        stop_hits.cast("bigint").alias("n_stop_distinct"),
    )
    # exact thousandths via integer `div` in BOTH engines (`//` in the
    # DuckDB oracle) — no float division to diverge on
    sig = base.select(
        id_col,
        "n_words",
        F.expr(
            "CASE WHEN n_words > 0 THEN (1000 * __tot_len) div n_words END"
        ).alias("mean_word_len_milli"),
        F.expr(
            "CASE WHEN n_words > 0 THEN (1000 * __n_sym) div n_words "
            "ELSE 1000 END"
        ).alias("symbol_milli"),
        F.expr("(1000 * __n_bullet) div __n_lines").alias("bullet_milli"),
        F.expr("(1000 * __n_ellipsis) div __n_lines").alias("ellipsis_milli"),
        "n_stop_distinct",
    )
    keep = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len_milli").between(
            min_mean_word_len_milli, max_mean_word_len_milli
        )
        & (F.col("symbol_milli") < max_symbol_milli)
        & (F.col("bullet_milli") < max_bullet_milli)
        & (F.col("ellipsis_milli") < max_ellipsis_milli)
        & (F.col("n_stop_distinct") >= min_stopword_hits)
    )
    return sig.withColumn("keep", keep.cast("int"))


def c4_rules(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_sentences: int = 3,
    min_words: int = 5,
) -> DataFrame:
    """C4-style rule-battery document filter (Raffel et al. 2020,
    arXiv:1910.10683 §2.2) — the other canonical pretraining rule set
    next to :func:`gopher_rules`: require at least ``min_sentences``
    sentences and ``min_words`` words, and drop documents containing
    the "lorem ipsum" placeholder, a curly brace (code/templating
    leak), the word "javascript" (unrendered-page boilerplate), or a
    cookies/policy notice phrase. (C4's remaining rules are span
    removal and exact dedup — :func:`~datacamp_etl_spark.operators.
    dedup.span_dedup` / ``dedup_exact`` in this engine.)

    Sentences are counted as terminal-punctuation marks (``. ! ?``),
    the C4 proxy. All signals are per-row regex/contains kernels —
    zero shuffles, zero UDFs; at 100 TB the battery runs inside the
    scan stage and ``keep`` pushes into a downstream filter. Returns
    ``(id, n_sentences, n_words, has_lorem_ipsum, has_curly_brace,
    has_javascript, has_policy_phrase, keep)`` with flags as int 0/1.
    """
    c = F.col(text_col)
    low = F.lower(c)
    policy = (
        low.contains("terms of use")
        | low.contains("privacy policy")
        | low.contains("cookie policy")
        | low.contains("uses cookies")
    )
    sig = df.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(c, F.lit(r"[.!?]"), 0))
        .cast("bigint")
        .alias("n_sentences"),
        F.size(tokens(text_col)).cast("bigint").alias("n_words"),
        low.contains("lorem ipsum").cast("int").alias("has_lorem_ipsum"),
        c.contains("{").cast("int").alias("has_curly_brace"),
        low.contains("javascript").cast("int").alias("has_javascript"),
        policy.cast("int").alias("has_policy_phrase"),
    )
    keep = (
        (F.col("n_sentences") >= min_sentences)
        & (F.col("n_words") >= min_words)
        & (F.col("has_lorem_ipsum") == 0)
        & (F.col("has_curly_brace") == 0)
        & (F.col("has_javascript") == 0)
        & (F.col("has_policy_phrase") == 0)
    )
    return sig.withColumn("keep", keep.cast("int"))


def readability_scores(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 4,
) -> DataFrame:
    """Flesch reading-ease + Flesch–Kincaid grade level (Flesch 1948;
    Kincaid et al. 1975) — the classic length-weighted readability
    pair, a standard feature in pretraining quality stacks next to
    the Gopher/C4 rule batteries:

        ease  = 206.835 - 1.015*(W/S) - 84.6*(Syl/W)
        grade = 0.39*(W/S) + 11.8*(Syl/W) - 15.59

    with W = normalized token count, S = sentence count (terminal
    punctuation runs ``[.!?]+``, floor 1 so unpunctuated text counts
    as one sentence), and Syl = the standard vowel-group syllable
    heuristic (runs of ``[aeiouy]+`` in the lowercased text; word
    boundaries are non-vowels, so the global count equals the
    per-word sum without an explode).

    All three counts are JVM-side regexp_count expressions — no
    tokenizer UDF, no explode, one narrow map stage; the two scores
    are fixed-order double arithmetic over exact integers, rounded
    once (cross-engine stable). Docs with zero words carry NULL
    scores. Returns ``(id_col, n_words, n_sentences, n_syllables,
    flesch_ease, fk_grade)``.
    """
    low = F.lower(F.col(text_col))
    n_words = F.size(tokens(text_col))
    n_sents = F.greatest(
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]+")), F.lit(1)
    )
    n_syll = F.regexp_count(low, F.lit(r"[aeiouy]+"))
    base = docs.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        n_sents.cast("long").alias("n_sentences"),
        n_syll.cast("long").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences").cast("double")
    spw = F.col("n_syllables").cast("double") / F.col("n_words").cast("double")
    return base.select(
        id_col,
        "n_words",
        "n_sentences",
        "n_syllables",
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw,
            ),
            decimals,
        ).alias("flesch_ease"),
        F.round(
            F.when(
                F.col("n_words") > 0,
                F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59),
            ),
            decimals,
        ).alias("fk_grade"),
    )
