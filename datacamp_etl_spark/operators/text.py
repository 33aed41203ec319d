"""Text-analysis operators for large-scale training-data pipelines [EXT].

Not present in the reference (its data plane is purely relational —
SURVEY §2.14); these are the north-star operators mandated by
BASELINE.json: language ID, quality scoring, token counting, document
fingerprinting. All are built from JVM-side ``pyspark.sql.functions``
(regex/array/lambda expressions) — no Python UDFs in the hot path, so
whole-stage codegen applies and the ops are embarrassingly parallel:
at 100 TB they run as a single narrow (shuffle-free) projection pass.

Cross-engine notes (for the DuckDB oracle): normalization uses
global-flag regex replace (DuckDB needs the explicit ``'g'`` flag) and
single-space splitting after whitespace collapse, so Spark and SQL
tokenizations agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "normalize_text",
    "tokens",
    "tokens_of_normalized",
    "token_count",
    "regex_token_count",
    "quality_score",
    "language_id",
    "language_id_from_tokens",
    "fingerprint",
    "rolling_hash",
    "text_profile",
    "sentence_stats",
    "token_entropy",
    "oov_rate",
    "source_kl_divergence",
    "perplexity_buckets",
    "pmi_collocations",
    "STOPWORDS",
    "LANG_MARKERS",
]

#: Small English stopword list for quality scoring (public-domain set).
STOPWORDS = (
    "the a an and or of to in is are was were be been on at by for with as"
).split()

#: Per-language marker words for the n-gram/stopword-hit language ID
#: heuristic. Ordered dict: ties resolve to the earlier language.
LANG_MARKERS: dict[str, list[str]] = {
    "en": "the and of to in is with for on small fast".split(),
    "de": "der die das und ist mit für von nicht ein".split(),
    "fr": "le la les et est pour dans une avec sur".split(),
    "es": "el la los y es para en una con por".split(),
    "zh": "的 了 在 是 我 有 和 就 不 人".split(),
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(col: Column | str) -> Column:
    """Canonical form: lowercase, non-alphanumerics -> space, collapse
    whitespace, trim. The shared normalization for fingerprints, exact
    dedup and shingling."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, r"[^\p{L}\p{N}]+", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of the normalized text (``array<string>``);
    empty text -> empty array."""
    return tokens_of_normalized(normalize_text(col))


def tokens_of_normalized(norm: Column) -> Column:
    """Tokens of an ALREADY-normalized string column. Use when the
    normalization was cached behind an ``evaluate_once`` barrier so the
    regex pass is not re-inlined per downstream reference."""
    return F.when(norm == "", F.array().cast("array<string>")).otherwise(
        F.split(norm, " ")
    )


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def regex_token_count(col: Column | str) -> Column:
    """BPE-ish token count: alpha runs, digit runs, and single
    non-space symbols each count as one token (a cheap, deterministic
    proxy for subword tokenizer load)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(_c(col)), F.lit(r"[\p{L}]+|[0-9]+|[^\p{L}0-9\s]"), 0
        )
    )


def quality_score(col: Column | str) -> dict[str, Column]:
    """Quality signals: length, token stats, stopword ratio, alpha
    ratio. Returned as named columns so callers select what they need
    (column pruning keeps unused signals out of the plan)."""
    c = _c(col)
    toks = tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
    alpha_chars = F.length(F.regexp_replace(c, r"[^\p{L}]+", ""))
    return {
        "n_chars": n_chars.cast("int"),
        "n_tokens": n_tok.cast("int"),
        "n_stopwords": n_stop.cast("int"),
        "n_alpha_chars": alpha_chars.cast("int"),
        "avg_token_len": F.when(
            n_tok > 0,
            (F.length(F.concat_ws("", toks)).cast("decimal(18,2)") / n_tok)
            .cast("decimal(18,4)"),
        ),
        "stopword_ratio": F.when(
            n_tok > 0,
            (n_stop.cast("decimal(18,2)") / n_tok).cast("decimal(18,4)"),
        ),
        "alpha_ratio": F.when(
            n_chars > 0,
            (alpha_chars.cast("decimal(18,2)") / n_chars).cast("decimal(18,4)"),
        ),
    }


def language_id(col: Column | str) -> Column:
    """Heuristic language ID: count marker-word hits per language over
    the token set; argmax wins, ties resolve in LANG_MARKERS order,
    zero hits -> 'und'. Deterministic and pure-JVM (arrays + lambdas),
    so it scales as a projection."""
    return language_id_from_tokens(tokens(col))


def language_id_from_tokens(toks: Column) -> Column:
    """:func:`language_id` over a precomputed token array — callers
    that already cached tokenization behind ``evaluate_once`` avoid
    re-tokenizing once per language score (5x on this kernel)."""

    def _contains(arr: Column):
        # single-arg lambda factory: F.filter inspects the signature,
        # so default-arg capture would be misread as (element, index)
        return lambda x: F.array_contains(arr, x)

    # Argmax over an ARRAY of per-language scores, not a chained
    # when-fold: the fold nests each score expression into every later
    # when(), so the tree holds ~2^|langs| copies of the marker-filter
    # — and higher-order functions are interpreted (never codegen'd),
    # so every copy re-evaluates (measured 8.6 s -> 0.3 s at sf0.1 for
    # the inline form). Here each filter is evaluated exactly once;
    # array_position returns the FIRST index of the max, so ties still
    # resolve to the earlier entry in LANG_MARKERS — matching the
    # docstring and the oracle's CASE order.
    scores = F.array(
        *[
            F.size(F.filter(toks, _contains(F.array(*map(F.lit, markers)))))
            for markers in LANG_MARKERS.values()
        ]
    )
    names = F.array(*[F.lit(lang) for lang in LANG_MARKERS])
    mx = F.array_max(scores)
    return F.when(
        mx > 0,
        F.element_at(names, F.array_position(scores, mx).cast("int")),
    ).otherwise(F.lit("und"))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: MD5 of the normalized text — the exact-dup
    key. (Reuses the reference's row-digest idea P4, loading.rb:254-270,
    applied to documents.)"""
    return F.md5(normalize_text(col))


#: Rolling-hash parameters: base 31 (classic Rabin-Karp), modulus
#: 1e9+7 (prime). Token values are 32-bit (8 hex digits of md5), so
#: acc*31 + tok stays far below 2^63 — no overflow in either engine.
ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007


def rolling_hash(col: Column | str) -> Column:
    """Order-sensitive document fingerprint: a Rabin-Karp polynomial
    rolling hash folded over the normalized token stream —
    ``h = (h * 31 + md5_32(token)) mod (1e9+7)``.

    Complements :func:`fingerprint` (MD5 of the whole normalized text):
    the fold form is the shape used for streaming/windowed fingerprints
    (extendable one token at a time), and its per-token hashing is what
    shingle-level fingerprinting builds on. Pure-JVM ``aggregate``
    lambda over the token array — a narrow codegen'd projection, no
    shuffle, no UDF; at 100 TB it runs in the scan stage."""
    tok_val = lambda x: F.conv(F.substring(F.md5(x), 1, 8), 16, 10).cast("long")  # noqa: E731
    return F.aggregate(
        tokens(col),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLLING_BASE + tok_val(x)) % ROLLING_MOD,
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile: all text-analysis signals as extra columns."""
    out = df
    for name, colexpr in quality_score(text_col).items():
        out = out.withColumn(name, colexpr)
    return (
        out.withColumn("lang_pred", language_id(text_col))
        .withColumn("fingerprint", fingerprint(text_col))
        .withColumn("n_tokens_bpe", regex_token_count(text_col))
    )


def chunk_text(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard pre-training / RAG corpus preparation step. One output
    row per chunk: ``(id, chunk_no, n_tokens, chunk)``.

    Pure JVM (split -> stride indices -> slice/join -> posexplode):
    no UDF, scales as a map-side projection; chunk boundaries are
    token-aligned so no mid-word cuts. Stride = chunk_tokens - overlap.
    The final window is emitted only when it adds new tokens (i.e.
    starts before the end of the previous stride or is the only one).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = tokens(text_col)
    n = F.size(toks)
    # window starts: 0, stride, 2*stride, ... while start < n (at least
    # one window even for empty-ish docs with n>0)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + 1
    )
    starts = F.transform(
        F.sequence(F.lit(0), n_chunks.cast("int") - 1), lambda i: i * stride
    )
    chunks = F.transform(
        starts,
        lambda s: F.array_join(F.slice(toks, s + 1, chunk_tokens), " "),
    )
    out = df.where(n > 0).select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_no", "chunk"),
    )
    return out.select(
        id_col,
        "chunk_no",
        F.size(F.split(F.col("chunk"), " ")).cast("int").alias("n_tokens"),
        "chunk",
    )


def token_entropy(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    decimals: int = 6,
) -> DataFrame:
    """Per-document Shannon entropy of the whitespace-token
    distribution (nats) — a repetition/diversity quality signal:
    boilerplate and keyword-stuffed spam score low, natural prose
    high. Returns ``(id, n_tokens, entropy)`` for documents with at
    least one token.

    Shape at scale: explode -> two map-side-combinable groupBys
    ((doc, term) counts, then per-doc fold of ``c * ln c``) — all
    shuffles are keyed by doc id, no window, no UDF. The entropy is
    computed as ``ln(n) - sum(c*ln(c))/n`` so only integer counts
    leave the first aggregation, and the result is rounded to
    ``decimals`` to absorb sum-order ulp drift (the cross-engine
    determinism contract kmeans_train also uses).
    """
    posting = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(text_col)).alias("term")
    )
    counts = posting.groupBy("id", "term").agg(F.count("*").alias("c"))
    return (
        counts.groupBy("id")
        .agg(
            F.sum("c").alias("n"),
            F.sum(F.col("c") * F.log(F.col("c"))).alias("s"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n").cast("long").alias("n_tokens"),
            F.round(F.log("n") - F.col("s") / F.col("n"), decimals).alias(
                "entropy"
            ),
        )
    )


def oov_rate(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    vocab_size: int = 100,
    decimals: int = 6,
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus' own
    top-``vocab_size`` token vocabulary (ties broken by token text) —
    the tokenizer-coverage signal a training pipeline uses to spot
    documents a fixed vocab would shred into rare tokens.

    Shape at scale: one (term) aggregation builds the vocab, which is
    ``vocab_size`` rows — broadcast-joined back against the posting
    relation (never the corpus against itself); per-doc totals are a
    doc-keyed aggregation. Returns ``(id, n_tokens, n_oov,
    oov_rate)``; rate = n_oov / n_tokens rounded to ``decimals``.
    """
    from datacamp_etl_spark.operators.spread import scoped_cache

    # the posting relation feeds both the vocab aggregation and the
    # marked join — cache it so the tokenizer runs once per action
    posting = scoped_cache(
        df.select(
            F.col(id_col).alias("id"),
            F.explode(tokens(text_col)).alias("term"),
        )
    )
    vocab = (
        posting.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "term")
        .limit(vocab_size)
        .select("term", F.lit(True).alias("__in_vocab"))
    )
    marked = posting.join(F.broadcast(vocab), "term", "left")
    return (
        marked.groupBy("id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("n_tokens").cast("long"),
            F.col("n_oov").cast("long"),
            F.round(F.col("n_oov") / F.col("n_tokens"), decimals).alias(
                "oov_rate"
            ),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    decimals: int = 6,
) -> DataFrame:
    """[EXT] Per-document bigram language-model score — the standard
    perplexity-style quality-filter signal (CCNet/KenLM recipe shape):
    a corpus-trained add-one-smoothed bigram model scores each
    document by its mean negative log-likelihood; template/boilerplate
    text (predictable continuations) scores LOW, token salad scores
    HIGH. Self-trained on the scored corpus itself, so no external
    model artifact is needed. Returns ``(id, n_bigrams, lm_score)``
    for documents with at least one bigram, where
    ``lm_score = avg(ln(c(w1) + V) - ln(c(w1,w2) + 1))`` over the
    document's bigram instances (V = corpus distinct-token count).

    Scale shape: one explode into (doc, w1, w2) rows cached for its
    three consumers (context counts, bigram counts, the scoring join),
    two map-side-combinable count aggregations, equi-joins back on
    the count keys (build sides are count tables — one row per
    distinct context/bigram, so a hot word meets a 1-row build and
    hash-join output stays bounded by the instance table), and a
    broadcast scalar for V. No window, no UDF; only integer counts
    cross the shuffles, the float fold happens once per document and
    is rounded (the repo's cross-engine ulp contract — ln of the same
    integers in both engines).
    """
    from datacamp_etl_spark.operators.spread import ensure_parallelism, scoped_cache

    toks = tokens(text_col)
    arr = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("id"), toks.alias("__t"))
        .where(F.size("__t") >= 2)
    )
    n = F.size("__t")
    bg = scoped_cache(
        arr.select(
            "id",
            F.explode(
                F.zip_with(
                    F.slice("__t", 1, n - 1),
                    F.slice("__t", 2, n - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("z"),
        ).select("id", F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
    )
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("__c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("__c1"))
    vocab = (
        df.select(F.explode(tokens(text_col)).alias("term"))
        .agg(F.count_distinct("term").alias("__v"))
    )
    cost = F.log(F.col("__c1") + F.col("__v")) - F.log(F.col("__c2") + F.lit(1))
    return (
        bg.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(F.avg(cost), decimals).alias("lm_score"),
        )
        .select(F.col("id").alias(id_col), "n_bigrams", "lm_score")
    )


def sentence_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document sentence statistics: ``(id, n_sentences,
    avg_sentence_tokens, max_sentence_tokens)`` — the sentence-shape
    quality signal (wall-of-text vs fragment spam) that complements
    the Gopher rule battery's word-level checks.

    Sentences split on terminal punctuation runs followed by
    whitespace (``[.!?]+\\s+`` — no lookbehind, so the regex means
    the same thing under Java regex and RE2/DuckDB; same
    cross-engine discipline as operators.pii). A trailing segment
    without terminal punctuation still counts as a sentence; empty
    documents report 0 sentences with NULL token stats. Explode +
    groupBy — one narrow shuffle of (id, token_count), no UDF, no
    per-row Python.
    """
    segs = df.select(
        F.col(id_col),
        F.explode_outer(
            F.split(F.col(text_col), r"[.!?]+\s+")
        ).alias("__seg"),
    )
    n_tok = F.when(
        F.trim(F.col("__seg")) != "",
        F.size(F.split(F.trim(F.col("__seg")), r"\s+")),
    )
    return (
        segs.select(F.col(id_col), n_tok.alias("__n"))
        .groupBy(id_col)
        .agg(
            F.count("__n").cast("long").alias("n_sentences"),
            F.round(F.avg("__n"), 6).alias("avg_sentence_tokens"),
            F.max("__n").cast("long").alias("max_sentence_tokens"),
        )
    )


def source_kl_divergence(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    decimals: int = 6,
) -> DataFrame:
    """Per-group unigram KL divergence against the whole corpus —
    the mixture-drift diagnostic a multi-source training-data
    pipeline runs before weighting sources: ``KL(P_g || Q) =
    sum_t p_t * ln(p_t / q_t)`` where ``P_g`` is group ``g``'s token
    distribution and ``Q`` the corpus's. 0 means the source looks
    like the corpus; large values flag outlier sources (boilerplate
    farms, wrong-language feeds) for capping or inspection.

    Every ``p`` term has ``q > 0`` by construction (a group's tokens
    are corpus tokens), so the sum is total and finite. Three
    aggregated shuffles — (group, token), (group), (token) counts —
    plus one 1-row corpus-total crossJoin (bounded broadcast); the
    final reduce is one more aggregated (group) shuffle. All JVM
    expressions; nothing driver-side.

    Returns ``(group_col, n_tokens, n_distinct_tokens, kl)``, KL
    rounded to ``decimals`` (the repo-wide float contract).
    """
    toks = df.select(
        F.col(group_col), normalize_text(F.col(text_col)).alias("__n")
    ).where(F.col("__n") != "").select(
        group_col, F.explode(F.split("__n", " ")).alias("token")
    )
    gt = toks.groupBy(group_col, "token").agg(F.count("*").alias("n_gt"))
    g = toks.groupBy(group_col).agg(F.count("*").alias("n_g"))
    ct = toks.groupBy("token").agg(F.count("*").alias("n_t"))
    n = toks.agg(F.count("*").alias("n_corpus"))
    p = F.col("n_gt") / F.col("n_g")
    q = F.col("n_t") / F.col("n_corpus")
    term = p * F.log(p / q)
    return (
        gt.join(g, group_col)
        .join(ct, "token")
        .crossJoin(F.broadcast(n))
        .groupBy(group_col)
        .agg(
            F.max("n_g").cast("long").alias("n_tokens"),
            F.count("*").cast("long").alias("n_distinct_tokens"),
            F.round(F.sum(term), decimals).alias("kl"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    *,
    buckets: int = 3,
    decimals: int = 6,
) -> DataFrame:
    """CCNet-style per-language perplexity banding (Wenzek et al.
    2020, arXiv:1911.00359): score every document with the corpus
    bigram LM (:func:`bigram_lm_scores`) and split each language into
    equal-count quality bands — CCNet's head/middle/tail, where "head"
    (lowest perplexity) feeds pretraining first and "tail" is
    discarded or down-weighted.

    Returns ``(id, lang, lm_score, bucket, band)`` for every document
    with >= 1 bigram; ``bucket`` is ANSI ``ntile(buckets)`` over
    ``(lm_score, id)`` within the language (the id tiebreak makes the
    banding deterministic), ``band`` is head/middle/tail for the
    default 3 buckets, ``b<k>`` otherwise.

    Scale note: the window partitions by LANGUAGE, so a mono-lingual
    mega-corpus concentrates in few partitions. CCNet itself computes
    the per-language cutoffs on a sample; for that regime, compute
    boundary literals per language with
    :func:`~datacamp_etl_spark.operators.ids.exact_ntile`'s
    range-exchange recipe instead of this exact in-partition tile.
    """
    from pyspark.sql import Window

    scores = bigram_lm_scores(df, id_col, text_col, decimals=decimals)
    w = Window.partitionBy(lang_col).orderBy("lm_score", id_col)
    bucket = F.ntile(buckets).over(w)
    if buckets == 3:
        band = (
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
        )
    else:
        band = F.concat(F.lit("b"), F.col("bucket").cast("string"))
    return (
        df.select(F.col(id_col), F.col(lang_col).alias("lang"))
        .join(scores, id_col)
        .select(id_col, "lang", "lm_score", bucket.alias("bucket"))
        .withColumn("band", band)
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_count: int = 5,
    decimals: int = 6,
) -> DataFrame:
    """Collocation extraction via pointwise mutual information
    (Church & Hanks 1990): for every adjacent token pair seen at
    least ``min_count`` times corpus-wide,
    ``pmi = ln(N * c(a,b) / (cl(a) * cr(b)))`` with the margins taken
    over BIGRAM events (cl = count as left element, cr = as right;
    N = total bigram instances) — self-consistent probabilities from
    one table, the standard "new york"-detector a tokenizer or phrase
    miner runs before committing a vocabulary.

    Scale shape: ONE corpus tokenize+explode into bigram instances,
    one map-side-combined count down to the bigram-TYPE table, and
    everything else (margins, N, the joins) runs on that bounded
    table — the fact rows are never touched again. The min_count
    filter is applied before the margin joins, so the join output is
    the answer's size. ln of exact integer ratios, rounded once (the
    repo's cross-engine ulp contract). Returns
    ``(w1, w2, n, pmi)``.
    """
    from datacamp_etl_spark.operators.spread import (
        ensure_parallelism,
        scoped_cache,
    )

    toks = tokens(text_col)
    arr = (
        ensure_parallelism(df)
        .select(toks.alias("__t"))
        .where(F.size("__t") >= 2)
    )
    n = F.size("__t")
    bg = arr.select(
        F.explode(
            F.zip_with(
                F.slice("__t", 1, n - 1),
                F.slice("__t", 2, n - 1),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            )
        ).alias("z")
    ).select(F.col("z.w1").alias("w1"), F.col("z.w2").alias("w2"))
    c2 = scoped_cache(
        bg.groupBy("w1", "w2").agg(F.count("*").alias("n"))
    )
    cl = c2.groupBy("w1").agg(F.sum("n").alias("__cl"))
    cr = c2.groupBy("w2").agg(F.sum("n").alias("__cr"))
    tot = c2.agg(F.sum("n").alias("__N"))
    return (
        c2.where(F.col("n") >= min_count)
        .join(cl, "w1")
        .join(cr, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1",
            "w2",
            F.col("n").cast("long").alias("n"),
            F.round(
                F.log(
                    F.col("__N") * F.col("n")
                    / (F.col("__cl") * F.col("__cr"))
                ),
                decimals,
            ).alias("pmi"),
        )
    )


def kwic_concordance(
    docs: DataFrame,
    term: str,
    *,
    context: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keyword-in-context concordance (the corpus-linguistics KWIC
    view; Luhn 1960): every occurrence of ``term`` with its ±context
    surrounding tokens — the audit view a curation reviewer uses to
    judge a filter term's real usage before adding it to a rule
    battery (is "spark" the framework or the ignition system?).

    One posexplode filtered to the term BEFORE any downstream work,
    then a pure slice/join on the carried token array — no
    self-join, no window, no UDF; output volume is O(occurrences).
    Returns ``(id_col, pos, context)`` with pos the 0-based token
    offset and context the space-joined token window (clamped at
    document edges).
    """
    base = docs.select(F.col(id_col), tokens(text_col).alias("__toks"))
    ex = base.select(
        id_col, "__toks", F.posexplode("__toks").alias("pos", "term")
    ).where(F.col("term") == term)
    lo = F.greatest(F.col("pos") - context, F.lit(0))
    hi = F.least(F.col("pos") + context, F.size("__toks") - 1)
    return ex.select(
        id_col,
        F.col("pos").cast("int").alias("pos"),
        F.array_join(
            F.slice("__toks", lo + 1, hi - lo + 1), " "
        ).alias("context"),
    )


def ngram_novelty(
    docs: DataFrame,
    *,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    decimals: int = 6,
) -> DataFrame:
    """Per-document n-gram novelty against the whole corpus: the
    fraction of a document's distinct word k-shingles whose FIRST
    corpus occurrence (minimum ``id_col``) is this document — the
    diversity/redundancy signal a curation pipeline reads before
    sampling (a low-novelty tail is boilerplate even when no single
    pair crosses a near-dup threshold; cf. the coverage/novelty
    framing in deduplication studies, Lee et al. 2022).

    One shingle explode (distinct within doc by construction), one
    groupBy(gram) for the first-occurrence table, one join back, one
    per-doc fold — all map-side-combinable equi-shuffles on the gram
    hash. Returns ``(id_col, n_grams, n_novel, novelty)`` for every
    document (short docs carry 0 grams and NULL novelty).
    """
    from datacamp_etl_spark.operators.dedup import shingles
    from datacamp_etl_spark.operators.spread import scoped_cache

    # Cache the exploded shingles: the first-occurrence aggregate and
    # the join-back both consume this relation — without the pin the
    # normalize+shingle kernel runs twice over the corpus.
    ex = scoped_cache(
        docs.select(
            F.col(id_col), F.explode(shingles(text_col, k)).alias("gram")
        )
    )
    first = ex.groupBy("gram").agg(F.min(id_col).alias("__first"))
    per = (
        ex.join(first, "gram")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("__first") == F.col(id_col), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    base = docs.select(id_col)
    return base.join(per, id_col, "left").select(
        id_col,
        F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce("n_novel", F.lit(0)).cast("long").alias("n_novel"),
        F.round(
            F.when(
                F.col("n_grams") > 0,
                F.col("n_novel").cast("double")
                / F.col("n_grams").cast("double"),
            ),
            decimals,
        ).alias("novelty"),
    )


def vocab_growth(
    docs: DataFrame,
    *,
    buckets: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary growth curve (Heaps' law view): documents are split
    into ``buckets`` equal-count strata by ``id_col`` order, and each
    stratum reports its token volume, its NEW word types (types whose
    first corpus occurrence falls in that stratum) and the cumulative
    curve — the corpus-health diagnostic that shows whether new data
    still adds vocabulary or only repeats it.

    Scale posture: the per-DOCUMENT total order that a naive
    cumulative curve needs is deliberately coarsened to a bucket
    granularity — bucketing uses the range-exchange
    :func:`~datacamp_etl_spark.operators.ids.exact_ntile` (parallel,
    never a single-task global window) and the only ordered window
    runs over the <= ``buckets``-row aggregate. Returns
    ``(bucket, n_tokens, new_types, cum_tokens, cum_types)``.
    """
    from pyspark.sql import Window as W

    from datacamp_etl_spark.operators.ids import exact_ntile

    from datacamp_etl_spark.operators.spread import scoped_cache

    binned = exact_ntile(
        docs.select(F.col(id_col), tokens(text_col).alias("__toks")),
        [id_col],
        buckets,
        bucket_col="bucket",
    )
    # One tokenizer pass total: fold the exploded tokens straight into
    # a (bucket, tok, count) table and cache THAT (vocab-bounded, two
    # ints + one string per row) — `vol` and the first-occurrence
    # aggregate both derive from it, where the previous shape ran the
    # two-regex tokenizer once per consumer (and caching the raw token
    # ARRAYS costs more in columnar materialization than it saves).
    # Count without the != "" filter so sum(count) == sum(size(toks)).
    g = scoped_cache(
        binned.select("bucket", F.explode("__toks").alias("tok"))
        .groupBy("bucket", "tok")
        .agg(F.count("*").alias("__c"))
    )
    # Bucket spine via the pruned ranking columns (tokenizer NOT
    # evaluated: bucket depends only on id order), so a bucket whose
    # documents are all token-free still reports n_tokens = 0 exactly
    # as the per-binned-row aggregate did.
    spine = binned.select("bucket").distinct()
    vol = spine.join(
        g.groupBy("bucket").agg(F.sum("__c").cast("long").alias("__nt")),
        "bucket",
        "left",
    ).select("bucket", F.coalesce("__nt", F.lit(0)).alias("n_tokens"))
    first = (
        g.where(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.min("bucket").alias("__fb"))
    )
    new_types = first.groupBy(F.col("__fb").alias("bucket")).agg(
        F.count("*").cast("long").alias("new_types")
    )
    per = vol.join(new_types, "bucket", "left").select(
        F.col("bucket").cast("int").alias("bucket"),
        "n_tokens",
        F.coalesce("new_types", F.lit(0)).cast("long").alias("new_types"),
    )
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per.select(
        "bucket",
        "n_tokens",
        "new_types",
        F.sum("n_tokens").over(w).cast("long").alias("cum_tokens"),
        F.sum("new_types").over(w).cast("long").alias("cum_types"),
    )
