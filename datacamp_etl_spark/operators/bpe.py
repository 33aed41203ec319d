"""Byte-pair-encoding tokenizer: train / encode, pure Python + Arrow.

[EXT] — no counterpart in the reference (Stiivi/Datacamp-ETL pushes all
text handling to SQL strings); the algorithm is the public BPE of
Sennrich et al. 2016 ("Neural Machine Translation of Rare Words with
Subword Units") as popularized by GPT-2's encoder: a learned table of
(left, right) subword merges applied greedily by rank. Training-data
pipelines end in token IDS, not whitespace tokens — this module makes
the chunk/pack/budget operators run on real tokenizer counts.

Design for 100 TB:

- **Training** operates on the word-frequency table, not the corpus:
  one distributed ``groupBy(word).count()``, a bounded top-``max_words``
  collect (zipfian corpora concentrate mass in the head; 50k words
  cover it), then the classic merge loop driver-side over that dict.
  The expensive part (the corpus scan) is one shuffle; the loop never
  touches the data again.
- **Encoding** is an Arrow ``mapInPandas`` kernel with the merge-rank
  dict broadcast (small — ``num_merges`` entries) and a per-task word
  memo: the same zipfian skew that bounds training makes the memo hit
  rate approach 1, so the per-word merge loop runs ~once per DISTINCT
  word per task, not once per occurrence. (The alternative — distinct
  words, encode, join back — trades the memo for an extra shuffle;
  the kernel form keeps encode a single narrow pass.)
- Normalization happens JVM-side (``text.normalize_text``) BEFORE the
  kernel, so the Python side never runs regexes and the oracle can
  replay the exact same normalization SQL.

Merge-application semantics (pinned, engine-portable): repeatedly find
the adjacent pair with the LOWEST merge rank — leftmost occurrence on
ties — merge that ONE occurrence, repeat until no adjacent pair is in
the table. Single-occurrence stepping is deterministic, equals the
usual merge-all-occurrences result wherever occurrences don't overlap,
and keeps the DuckDB oracle replay a plain recursive CTE.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datacamp_etl_spark.operators.text import normalize_text

__all__ = [
    "FIXTURE_MERGES_V1",
    "FIXTURE_WORDPIECE_V1",
    "bpe_train",
    "bpe_encode",
    "bpe_apply_word",
    "bpe_decode_expr",
    "wordpiece_train",
    "wordpiece_word",
    "wordpiece_encode",
    "FIXTURE_UNIGRAM_V1",
    "UNIGRAM_COST_SCALE",
    "unigram_train",
    "unigram_word",
    "unigram_encode",
]


def _word_counts(docs, text_col: str, max_words: int):
    """Shared trainer front-end: ONE distributed word-count shuffle,
    bounded top-``max_words`` collect (count desc, word asc — the tie
    order makes training deterministic across partitionings). Both
    tokenizer trainers consume this; nothing after the collect touches
    the cluster."""
    norm = docs.select(normalize_text(F.col(text_col)).alias("__norm"))
    return (
        norm.where(F.col("__norm") != "")
        .select(F.explode(F.split(F.col("__norm"), " ")).alias("word"))
        .groupBy("word")
        .count()
        .orderBy(F.col("count").desc(), F.col("word"))
        .limit(max_words)
        .collect()
    )


def _merge_pair_in_syms(
    syms: tuple, best: tuple, merged: str
) -> tuple:
    """Replace every adjacent ``best`` pair in one symbol tuple with
    ``merged`` (left-to-right, non-overlapping) — the training-side
    merge application both trainers share."""
    out = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def bpe_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    num_merges: int = 64,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from a corpus; returns the
    ranked merge list ``[(left, right), ...]``.

    One distributed word-count shuffle, then a bounded driver-side
    collect of the top-``max_words`` (count desc, word asc — the tie
    order makes training deterministic across partitionings), then the
    classic Sennrich merge loop over the word-frequency dict: each
    round counts every adjacent symbol pair weighted by word frequency,
    merges the most frequent (lexicographically smallest pair on ties)
    in all words, and records it. Nothing after the collect touches
    the cluster.
    """
    if num_merges < 1:
        raise ValueError("num_merges must be >= 1")
    counts = _word_counts(docs, text_col, max_words)
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["word"]): int(r["count"]) for r in counts
    }
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, freq in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + freq
        if not pairs:
            break
        # max count, lexicographically smallest pair on ties
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            key = _merge_pair_in_syms(syms, best, merged)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return merges


def bpe_apply_word(
    word: str, ranks: dict[tuple[str, str], int]
) -> list[str]:
    """Apply ranked merges to one word under the pinned semantics:
    merge the single LEFTMOST occurrence of the lowest-rank adjacent
    pair, repeat to fixpoint."""
    toks = list(word)
    while len(toks) > 1:
        best_rank = None
        best_i = -1
        for i in range(len(toks) - 1):
            r = ranks.get((toks[i], toks[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        toks[best_i : best_i + 2] = [toks[best_i] + toks[best_i + 1]]
    return toks


def bpe_decode_expr(tokens_str, marker: str = "</w>"):
    """Decode a marker-carrying token string back to the normalized
    text it encodes — a pure JVM expression (no kernel): drop the
    subword joiner spaces, turn each word-end marker into a word
    separator, trim the trailing one. Lossless against
    ``bpe_encode(word_end_marker=marker)`` because subwords are
    alphanumeric post-normalization (the marker and the joiner can't
    collide with content)."""
    c = F.col(tokens_str) if isinstance(tokens_str, str) else tokens_str
    return F.rtrim(
        F.replace(
            F.replace(c, F.lit(" "), F.lit("")), F.lit(marker), F.lit(" ")
        )
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
    word_end_marker: str | None = None,
) -> DataFrame:
    """Encode each document with a (pre-trained) merge table; returns
    ``(id, *carry_cols, n_words, n_tokens, tokens_str)`` where
    ``tokens_str`` is the space-joined subword sequence (subwords are
    alphanumeric-only post-normalization, so space is an unambiguous
    joiner). ``carry_cols`` pass through the kernel untouched —
    cheaper than joining metadata back on afterwards.

    Normalization runs JVM-side first (one narrow projection); the
    Arrow kernel only splits on single spaces and runs the merge loop
    through a per-task word memo. No shuffle — a 100 TB encode is one
    embarrassingly parallel pass.

    ``word_end_marker`` (Sennrich-style ``</w>``) appends the marker
    to each word's LAST subword, making the encoding losslessly
    decodable (:func:`bpe_decode_expr`); the default ``None`` keeps
    the marker-free representation the registered count/packing
    entries hash. The memo stores marker-free encodings, so the same
    word costs one merge loop either way.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}
    if len(ranks) != len(merges):
        raise ValueError("duplicate pair in merges")
    prepared = docs.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in carry_cols],
        normalize_text(F.col(text_col)).alias("__norm"),
    )
    dtypes = dict(docs.dtypes)
    out_schema = ", ".join(
        [f"{id_col} {dtypes[id_col]}"]
        + [f"{c} {dtypes[c]}" for c in carry_cols]
        + ["n_words bigint", "n_tokens bigint", "tokens_str string"]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            n_words, n_tokens, strs = [], [], []
            for norm in pdf["__norm"]:
                words = norm.split(" ") if norm else []
                toks: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = bpe_apply_word(w, ranks)
                        memo[w] = enc
                    if word_end_marker is None:
                        toks.extend(enc)
                    else:
                        toks.extend(enc[:-1])
                        toks.append(enc[-1] + word_end_marker)
                n_words.append(len(words))
                n_tokens.append(len(toks))
                strs.append(" ".join(toks))
            out = {id_col: pdf["__id"]}
            for c in carry_cols:
                out[c] = pdf[c]
            out["n_words"] = n_words
            out["n_tokens"] = n_tokens
            out["tokens_str"] = strs
            yield pd.DataFrame(out)

    return prepared.mapInPandas(kernel, out_schema)


#: Merges learned once from the sf0.01 documents fixture via
#: ``bpe_train(num_merges=64)`` — the shipped-tokenizer form real
#: pipelines use (GPT-2's merges file is pretrained and fixed, not
#: refit per corpus). Pinned as a constant so the registered query's
#: oracle SQL can embed the identical table as literals;
#: tests/test_bpe.py re-derives it from the fixture to guard rot.
FIXTURE_MERGES_V1: list[tuple[str, str]] = [
    ("e", "r"), ("i", "n"), ("o", "w"), ("o", "r"), ("s", "t"),
    ("m", "er"), ("a", "t"), ("l", "u"), ("a", "r"), ("p", "ar"),
    ("j", "o"), ("jo", "in"), ("a", "s"), ("as", "h"), ("h", "ash"),
    ("r", "ow"), ("at", "c"), ("atc", "h"), ("b", "atch"), ("a", "n"),
    ("c", "an"), ("s", "can"), ("c", "o"), ("c", "u"), ("co", "lu"),
    ("colu", "m"), ("colum", "n"), ("cu", "st"), ("cust", "o"),
    ("custo", "mer"), ("f", "i"), ("fi", "l"), ("fil", "t"),
    ("filt", "er"), ("a", "l"), ("al", "l"), ("m", "all"),
    ("s", "mall"), ("g", "e"), ("l", "ow"), ("mer", "ge"),
    ("s", "low"), ("c", "t"), ("ct", "or"), ("d", "er"),
    ("e", "ctor"), ("or", "der"), ("v", "ector"), ("in", "e"),
    ("l", "ine"), ("a", "b"), ("ab", "l"), ("abl", "e"), ("at", "a"),
    ("d", "ata"), ("t", "able"), ("u", "p"), ("a", "g"), ("ag", "g"),
    ("a", "lu"), ("alu", "e"), ("v", "alue"), ("e", "y"), ("k", "ey"),
]


# ---------------------------------------------------------------------
# WordPiece (Schuster & Nakajima 2012; the BERT tokenizer family)
# ---------------------------------------------------------------------

#: Pinned WordPiece vocabulary for the registered wordpiece_encode
#: query: wordpiece_train(sf0.001 documents, vocab_size=160) frozen as
#: a literal (training converged at 139 pieces — every fixture word
#: fully merged). Like FIXTURE_MERGES_V1, pinning lets the oracle SQL
#: embed the identical piece list; at sf0.01 unseen word-initial
#: characters exercise the whole-word [UNK] path. tests/test_bpe.py
#: re-derives it from the fixture to guard rot.
FIXTURE_WORDPIECE_V1: list[str] = [
    "##a", "##b", "##c", "##d", "##e", "##g", "##h", "##i", "##k",
    "##l", "##m", "##n", "##o", "##p", "##r", "##s", "##t", "##u",
    "##w", "##y", "a", "b", "c", "d", "f", "g", "h", "j", "k", "l",
    "m", "o", "p", "q", "r", "s", "t", "v", "w", "wi", "li", "qu",
    "win", "wind", "lin", "th", "##sh", "##ch", "fi", "bi", "##in",
    "big", "ag", "agg", "fil", "##bl", "##up", "sp", "##us", "cus",
    "##lu", "##lum", "##lumn", "##ll", "sl", "sc", "##ct", "filt",
    "##st", "##tch", "cust", "##ow", "window", "slow", "row",
    "##olumn", "column", "##oin", "join", "##cto", "custo", "##oup",
    "dup", "custom", "so", "sm", "st", "##an", "scan", "pa", "##alu",
    "valu", "##ash", "hash", "##am", "##ast", "fast", "##atch",
    "batch", "spa", "##abl", "tabl", "##all", "small", "da", "##ta",
    "data", "##rt", "sort", "part", "##rd", "ord", "##rg", "##roup",
    "group", "##ctor", "str", "##rk", "spark", "##ry", "##er",
    "order", "filter", "customer", "value", "line", "##ey", "key",
    "##erg", "merg", "merge", "##ery", "query", "##ector", "vector",
    "##eam", "stream", "the", "table",
]


def wordpiece_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 256,
    max_words: int = 50_000,
) -> list[str]:
    """Learn a WordPiece vocabulary; returns the piece list (word-
    initial pieces plain, continuations ``##``-prefixed), single
    characters first, then merges in learned order.

    Same 100 TB shape as :func:`bpe_train` — ONE distributed
    word-count shuffle, bounded top-``max_words`` collect, driver-side
    loop over the frequency dict — but the merge criterion is
    WordPiece's LIKELIHOOD score ``freq(ab) / (freq(a) * freq(b))``
    (merge the pair that most increases unigram-LM corpus likelihood,
    Schuster & Nakajima 2012) instead of BPE's raw pair count; higher
    score wins, raw count then lexicographic pair break ties
    deterministically. Stops at ``vocab_size`` pieces or when no
    adjacent pair remains.
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    counts = _word_counts(docs, text_col, max_words)
    # word-initial char plain, continuations ##-prefixed
    vocab: dict[tuple[str, ...], int] = {}
    for r in counts:
        w = r["word"]
        syms = tuple([w[0]] + [f"##{c}" for c in w[1:]])
        vocab[syms] = vocab.get(syms, 0) + int(r["count"])

    pieces: list[str] = sorted({s for syms in vocab for s in syms})
    piece_set = set(pieces)

    def _join(a: str, b: str) -> str:
        return a + b[2:] if b.startswith("##") else a + b

    while len(pieces) < vocab_size:
        pair_freq: dict[tuple[str, str], int] = {}
        sym_freq: dict[str, int] = {}
        for syms, freq in vocab.items():
            for s in syms:
                sym_freq[s] = sym_freq.get(s, 0) + freq
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + freq
        if not pair_freq:
            break
        # likelihood score; exact integer cross-multiplication compare
        # via fractions is overkill — float ratio + count + lex pair
        # tie-break is deterministic (same floats everywhere, Python
        # driver-side only)
        best = min(
            pair_freq.items(),
            key=lambda kv: (
                -(kv[1] / (sym_freq[kv[0][0]] * sym_freq[kv[0][1]])),
                -kv[1],
                kv[0],
            ),
        )[0]
        merged = _join(best[0], best[1])
        # two different merge paths can yield the same surface string
        # (('a','##bc') and ('ab','##c') both produce 'abc'); without
        # this guard the duplicate would count toward vocab_size and
        # silently shrink the effective vocabulary
        if merged not in piece_set:
            pieces.append(merged)
            piece_set.add(merged)
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, freq in vocab.items():
            key = _merge_pair_in_syms(syms, best, merged)
            new_vocab[key] = new_vocab.get(key, 0) + freq
        vocab = new_vocab
    return pieces


def wordpiece_word(word: str, vocab: set[str], unk: str = "[UNK]") -> list[str]:
    """Tokenize one word with WordPiece's greedy LONGEST-MATCH-FIRST:
    take the longest vocab piece that prefixes the remainder (##-form
    after the first piece); if none matches, the WHOLE word is
    ``unk`` (BERT semantics — no partial fallback)."""
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = n
        piece = None
        while j > i:
            cand = word[i:j] if i == 0 else f"##{word[i:j]}"
            if cand in vocab:
                piece = cand
                break
            j -= 1
        if piece is None:
            return [unk]
        out.append(piece)
        i = j
    return out


def wordpiece_encode(
    docs: DataFrame,
    pieces: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
    unk: str = "[UNK]",
) -> DataFrame:
    """Encode each document with a (pre-trained) WordPiece vocabulary;
    returns ``(id, *carry_cols, n_words, n_tokens, n_unk,
    tokens_str)``. Same execution shape as :func:`bpe_encode`: JVM-side
    normalization, then one embarrassingly parallel Arrow kernel with
    the vocab broadcast and a per-task word memo (zipfian corpora make
    the memo hit rate approach 1). Greedy longest-match runs at most
    O(len(word)^2) string probes per DISTINCT word per task.
    """
    vocab = set(pieces)
    prepared = docs.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in carry_cols],
        normalize_text(F.col(text_col)).alias("__norm"),
    )
    dtypes = dict(docs.dtypes)
    out_schema = ", ".join(
        [f"{id_col} {dtypes[id_col]}"]
        + [f"{c} {dtypes[c]}" for c in carry_cols]
        + ["n_words bigint", "n_tokens bigint", "n_unk bigint",
           "tokens_str string"]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            n_words, n_tokens, n_unks, strs = [], [], [], []
            for norm in pdf["__norm"]:
                words = norm.split(" ") if norm else []
                toks: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = wordpiece_word(w, vocab, unk)
                        memo[w] = enc
                    toks.extend(enc)
                n_words.append(len(words))
                n_tokens.append(len(toks))
                n_unks.append(sum(1 for t in toks if t == unk))
                strs.append(" ".join(toks))
            out = {id_col: pdf["__id"]}
            for c in carry_cols:
                out[c] = pdf[c]
            out["n_words"] = n_words
            out["n_tokens"] = n_tokens
            out["n_unk"] = n_unks
            out["tokens_str"] = strs
            yield pd.DataFrame(out)

    return prepared.mapInPandas(kernel, out_schema)


# ---------------------------------------------------------------------
# Unigram LM (Kudo 2018, arXiv:1804.10959; the SentencePiece family)
# ---------------------------------------------------------------------

#: Fixed-point scale for unigram piece costs: cost = round(-ln(p) *
#: UNIGRAM_COST_SCALE) as an INTEGER. The Viterbi DP then runs in pure
#: integer arithmetic, so the same (pieces, costs) table produces the
#: same segmentation in ANY engine — the property the oracle-gated
#: encode entry needs (float log-prob sums could tie-break differently
#: across engines at the last ulp).
UNIGRAM_COST_SCALE = 1_000_000

#: Blocked-prefix sentinel (no vocab path reaches this position).
#: Far above any real path cost (30 chars x ~28e6 max piece cost
#: ~ 1e9) yet small enough that the packed comparison key below
#: stays inside int64.
_UNIGRAM_INF = 1 << 50


#: Hard cap on normalized word length for unigram Viterbi: the packed
#: comparison key gives ntok 6 bits, so any word that could segment
#: into more than 63 pieces (i.e. longer than 63 chars) would carry
#: ntok into the cost field and corrupt the ordering (e.g.
#: key(100,70,1) == key(101,6,1)). Words longer than this become a
#: whole-word [UNK] — the same convention as WordPiece's
#: max_input_chars_per_word (BERT uses 100): real corpora do contain
#: 64+-char alphanumeric runs (hashes, base64), and a tokenizer
#: treating them as [UNK] is standard behavior, not data loss.
UNIGRAM_MAX_WORD_CHARS = 63


def _unigram_key(cost: int, ntok: int, L: int) -> int:
    """Pack the Viterbi candidate ordering into ONE integer:
    minimize total cost, then token count, then PREFER the longer
    last piece. ntok and L are < 64 by construction —
    :func:`unigram_word` rejects words longer than
    ``UNIGRAM_MAX_WORD_CHARS`` before the DP starts; the packed
    compare is exact integer arithmetic, replayed verbatim in the
    oracle SQL."""
    return ((cost * 64) + ntok) * 64 + (63 - L)


#: Pinned unigram-LM vocabulary for the registered unigram_encode
#: query: unigram_train(sf0.001 documents, vocab_size=44) frozen as a
#: (piece, integer cost) literal — small enough that frequent fixture
#: words stay whole pieces while rarer words fall back to sub-piece /
#: character Viterbi paths, so the gate exercises every branch of the
#: DP. tests/test_round9_ops.py re-derives it to guard rot.
FIXTURE_UNIGRAM_V1: list[tuple[str, int]] = [
    ("a", 2191306), ("agg", 4086064), ("b", 3044241), ("c", 3451186),
    ("column", 4060196), ("d", 4115854), ("e", 3044611),
    ("f", 10946728), ("fast", 4128897), ("filter", 4124531),
    ("g", 4154384), ("group", 4106182), ("h", 3439587),
    ("hash", 4118016), ("i", 4154384), ("j", 10946728),
    ("join", 4104045), ("k", 4132185), ("key", 4094485),
    ("l", 3045721), ("line", 4093429), ("m", 3457875),
    ("merge", 4105113), ("n", 10946728), ("o", 3475934),
    ("order", 4063265), ("p", 4100848), ("part", 4075637),
    ("q", 10946728), ("query", 4106182), ("r", 3058394),
    ("s", 3046462), ("scan", 4054086), ("slow", 4120183),
    ("sort", 4064291), ("stream", 4122354), ("t", 2532897),
    ("u", 4123442), ("v", 10946728), ("value", 4089214),
    ("vector", 4109395), ("w", 4181689), ("window", 4062241),
    ("y", 10946728),
]


def unigram_train(
    docs: DataFrame,
    *,
    text_col: str = "text",
    vocab_size: int = 128,
    max_words: int = 50_000,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_rounds: int = 2,
    shrink: float = 0.75,
) -> list[tuple[str, int]]:
    """Learn a unigram-LM vocabulary (Kudo 2018): seed with frequent
    substrings, alternate Viterbi-EM (hard-EM — each word re-segmented
    under current piece costs, pieces re-scored by usage) with
    likelihood-greedy PRUNING (drop the least-used multi-char pieces,
    ``shrink`` of the surplus per round) until ``vocab_size`` pieces
    remain, then ``em_rounds`` final EM passes. Single characters are
    never pruned, so every training word stays segmentable.

    Returns ``[(piece, cost)]`` sorted by piece, where ``cost =
    round(-ln((count + 1) / (total + |V|)) * UNIGRAM_COST_SCALE)`` —
    add-one smoothing keeps every kept piece's cost finite, and the
    integer fixed-point makes downstream Viterbi engine-portable.

    Same 100 TB shape as the BPE/WordPiece trainers: ONE distributed
    word-count shuffle, bounded top-``max_words`` collect, driver-side
    loop over the frequency dict (documented zipf-head contract); the
    cluster never sees the EM loop.
    """
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if max_piece_len < 1:
        raise ValueError("max_piece_len must be >= 1")
    words = {
        r["word"]: int(r["count"])
        for r in _word_counts(docs, text_col, max_words)
    }

    # seed inventory: every substring up to max_piece_len, scored by
    # corpus occurrence frequency x length (long frequent pieces are
    # the valuable ones — same heuristic family as SentencePiece's
    # suffix-array seed)
    from collections import Counter

    sub_freq: Counter = Counter()
    chars: set[str] = set()
    for w, c in sorted(words.items()):
        for i in range(len(w)):
            chars.add(w[i])
            for L in range(1, min(max_piece_len, len(w) - i) + 1):
                sub_freq[w[i : i + L]] += c
    multi = sorted(
        (p for p in sub_freq if len(p) > 1),
        key=lambda p: (-sub_freq[p] * len(p), p),
    )
    seed_budget = max(vocab_size * seed_factor - len(chars), 0)
    pieces = sorted(chars) + multi[:seed_budget]
    counts = {p: sub_freq[p] for p in pieces}

    def _em_pass(current: dict[str, int]) -> dict[str, int]:
        """One hard-EM pass: Viterbi-segment every word under costs
        derived from ``current``, return piece usage counts."""
        total = sum(current.values()) or 1
        import math

        cost = {
            p: max(
                1,
                round(-math.log(c / total) * UNIGRAM_COST_SCALE),
            )
            for p, c in current.items()
            if c > 0
        }
        # single chars always survive with at least a floor count so
        # every word segments
        for ch in chars:
            cost.setdefault(ch, _UNIGRAM_INF // (1 << 20))
        used: Counter = Counter()
        for w, c in sorted(words.items()):
            for piece in unigram_word(w, cost, max_piece_len):
                used[piece] += c
        return dict(used)

    def _keep_chars(cnt: dict[str, int]) -> dict[str, int]:
        # single characters are never pruned (every training word must
        # stay segmentable) — an EM pass that didn't USE a char would
        # otherwise silently drop it from the model
        for ch in chars:
            cnt.setdefault(ch, 0)
        return cnt

    target = max(vocab_size, len(chars))
    while True:
        counts = _keep_chars(_em_pass(counts))
        counts = {p: c for p, c in counts.items() if c > 0 or len(p) == 1}
        n_over = len(counts) - target
        if n_over <= 0:
            break
        # prune the least-used multi-char pieces, `shrink` of the
        # surplus at a time (ties: lexicographic — deterministic)
        droppable = sorted(
            (p for p in counts if len(p) > 1),
            key=lambda p: (counts[p], p),
        )
        n_drop = max(1, int(n_over * shrink))
        for p in droppable[:n_drop]:
            del counts[p]
    for _ in range(em_rounds):
        counts = _keep_chars(_em_pass(counts))
    counts = {p: c for p, c in counts.items() if c > 0 or len(p) == 1}

    import math

    total = sum(counts.values())
    v = len(counts)
    return sorted(
        (
            p,
            max(
                1,
                round(
                    -math.log((c + 1) / (total + v)) * UNIGRAM_COST_SCALE
                ),
            ),
        )
        for p, c in counts.items()
    )


def unigram_word(
    word: str, cost: dict[str, int], max_piece_len: int
) -> list[str]:
    """Viterbi-segment one word under integer piece costs: the
    segmentation minimizing ``(sum of costs, token count, shorter
    last pieces last)`` via the packed :func:`_unigram_key` compare —
    exact integer DP, so any engine replays it bit-for-bit. A prefix
    no vocab path reaches makes the WHOLE word ``[UNK]`` (the repo's
    wordpiece contract; with single characters in the vocab this only
    happens for characters unseen in training). Words longer than
    ``UNIGRAM_MAX_WORD_CHARS`` are ``[UNK]`` without running the DP —
    beyond that length the packed key's 6-bit token-count field could
    overflow into the cost field (see UNIGRAM_MAX_WORD_CHARS)."""
    n = len(word)
    if n > UNIGRAM_MAX_WORD_CHARS:
        return ["[UNK]"]
    INF_KEY = _unigram_key(_UNIGRAM_INF, 0, 0)
    best = [INF_KEY] * (n + 1)
    back = [0] * (n + 1)
    best[0] = _unigram_key(0, 0, 0)
    for j in range(1, n + 1):
        for L in range(1, min(j, max_piece_len) + 1):
            c = cost.get(word[j - L : j])
            if c is None or best[j - L] >= INF_KEY:
                continue
            prev_cost = best[j - L] // 4096
            prev_ntok = (best[j - L] // 64) % 64
            cand = _unigram_key(prev_cost + c, prev_ntok + 1, L)
            if cand < best[j]:
                best[j] = cand
                back[j] = L
    if best[n] >= INF_KEY:
        return ["[UNK]"]
    out: list[str] = []
    j = n
    while j > 0:
        L = back[j]
        out.append(word[j - L : j])
        j -= L
    out.reverse()
    return out


def unigram_encode(
    docs: DataFrame,
    pieces: list[tuple[str, int]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Encode each document with a (pre-trained) unigram-LM vocabulary
    via integer-cost Viterbi; returns ``(id, *carry_cols, n_words,
    n_tokens, n_unk, tokens_str)`` — the same surface as
    :func:`wordpiece_encode`, and the same execution shape: JVM-side
    normalization, then ONE embarrassingly parallel Arrow kernel with
    the (piece -> cost) dict broadcast and a per-task word memo. No
    shuffle at any scale. Unigram pieces are plain substrings (no
    continuation marker), so ``concat(tokens of word) == word``
    whenever the word segmented (round-trip property)."""
    cost = dict(pieces)
    max_len = max((len(p) for p in cost), default=1)
    prepared = docs.select(
        F.col(id_col).alias("__id"),
        *[F.col(c) for c in carry_cols],
        normalize_text(F.col(text_col)).alias("__norm"),
    )
    dtypes = dict(docs.dtypes)
    out_schema = ", ".join(
        [f"{id_col} {dtypes[id_col]}"]
        + [f"{c} {dtypes[c]}" for c in carry_cols]
        + ["n_words bigint", "n_tokens bigint", "n_unk bigint",
           "tokens_str string"]
    )

    def kernel(batches: Iterator) -> Iterator:
        import pandas as pd

        memo: dict[str, list[str]] = {}
        for pdf in batches:
            n_words, n_tokens, n_unks, strs = [], [], [], []
            for norm in pdf["__norm"]:
                words = norm.split(" ") if norm else []
                toks: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = unigram_word(w, cost, max_len)
                        memo[w] = enc
                    toks.extend(enc)
                n_words.append(len(words))
                n_tokens.append(len(toks))
                n_unks.append(sum(1 for t in toks if t == "[UNK]"))
                strs.append(" ".join(toks))
            out = {id_col: pdf["__id"]}
            for c in carry_cols:
                out[c] = pdf[c]
            out["n_words"] = n_words
            out["n_tokens"] = n_tokens
            out["n_unk"] = n_unks
            out["tokens_str"] = strs
            yield pd.DataFrame(out)

    return prepared.mapInPandas(kernel, out_schema)
