"""BPE tokenizer [EXT]: training determinism, pinned merge semantics,
fixture-merges rot guard, encode kernel contracts."""

from __future__ import annotations

import os

import pytest

from datacamp_etl_spark.operators import bpe as B

SF001 = "/root/testdata/sf0.01"


def test_apply_word_leftmost_lowest_rank():
    # rank 0 = (a,b), rank 1 = (ab,ab): 'abab' merges pairwise then whole
    ranks = {("a", "b"): 0, ("ab", "ab"): 1}
    assert B.bpe_apply_word("abab", ranks) == ["abab"]
    # lowest rank wins over leftmost position: (b,c) rank 0 beats (a,b) rank 1
    ranks = {("a", "b"): 1, ("b", "c"): 0}
    assert B.bpe_apply_word("abc", ranks) == ["a", "bc"]
    # leftmost occurrence on equal rank (same pair twice)
    ranks = {("a", "a"): 0}
    assert B.bpe_apply_word("aaa", ranks) == ["aa", "a"]
    # no applicable merge -> chars
    assert B.bpe_apply_word("xyz", {("a", "b"): 0}) == ["x", "y", "z"]


def test_train_hand_checked_corpus(spark):
    # 'aaab' x3 + 'ab' x1: pair counts (a,a)=6, (a,b)=4 -> first merge
    # (a,a); then ('aa','a')=3, ('aa','b')=3? no: 'aaab' -> ['aa','a','b']
    # pairs ('aa','a')=3, ('a','b')=3+1=4 -> second merge ('a','b').
    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab ab")], "doc_id long, text string"
    )
    merges = B.bpe_train(docs, num_merges=2)
    assert merges == [("a", "a"), ("a", "b")]


def test_train_tiebreak_lexicographic(spark):
    # 'xy' and 'ab' equally frequent -> (a,b) before (x,y)
    docs = spark.createDataFrame(
        [(1, "xy ab"), (2, "ab xy")], "doc_id long, text string"
    )
    merges = B.bpe_train(docs, num_merges=2)
    assert merges == [("a", "b"), ("x", "y")]


@pytest.mark.skipif(not os.path.isdir(SF001), reason="fixture absent")
def test_fixture_merges_match_training(spark):
    """FIXTURE_MERGES_V1 is pinned so the registered oracle can embed
    it as literals — it must stay exactly bpe_train's output on the
    sf0.01 documents fixture."""
    docs = spark.read.parquet(os.path.join(SF001, "documents.parquet"))
    assert B.bpe_train(docs, num_merges=64) == B.FIXTURE_MERGES_V1


def test_encode_contracts(spark):
    docs = spark.createDataFrame(
        [
            (1, "src_a", "abab xyz"),
            (2, "src_b", ""),
            (3, "src_a", None),
        ],
        "doc_id long, source string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in B.bpe_encode(
            docs, [("a", "b")], carry_cols=("source",)
        ).collect()
    }
    assert out[1]["n_words"] == 2
    assert out[1]["n_tokens"] == 5  # ab ab | x y z
    assert out[1]["tokens_str"] == "ab ab x y z"
    assert out[1]["source"] == "src_a"
    for empty_id in (2, 3):
        assert out[empty_id]["n_words"] == 0
        assert out[empty_id]["n_tokens"] == 0
        assert out[empty_id]["tokens_str"] == ""


def test_encode_rejects_duplicate_merges(spark):
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="duplicate"):
        B.bpe_encode(docs, [("a", "b"), ("a", "b")])


# ---------------------------------------------------------------------
# WordPiece (round-8): likelihood-scored training + greedy
# longest-match encode
# ---------------------------------------------------------------------

def test_wordpiece_train_uses_likelihood_not_raw_count(spark):
    """The pair with the HIGHEST likelihood score must merge first even
    when another pair has a higher raw count — the criterion that
    separates WordPiece from BPE."""
    from datacamp_etl_spark.operators.bpe import bpe_train, wordpiece_train

    rows = (
        [(i, "ab") for i in range(10)]          # pair (a,##b): count 10
        + [(100 + i, "xy") for i in range(2)]   # pair (x,##y): count 2
        + [(200 + i, "a") for i in range(20)]   # inflate a's unigram freq
        + [(300 + i, "b") for i in range(20)]   # inflate b's... (plain b)
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # char inventory = {##b, ##y, a, b, x} (5 pieces); merges follow
    pieces = wordpiece_train(docs, vocab_size=7)
    # score(x,##y) = 2/(2*2) = 0.5 >> score(a,##b) = 10/(30*10)
    assert pieces[5] == "xy"   # first merge: highest likelihood
    assert pieces[6] == "ab"   # second: the higher-count pair
    # BPE on the same corpus merges the higher-COUNT pair first
    assert bpe_train(docs, num_merges=1) == [("a", "b")]


def test_wordpiece_train_never_emits_duplicate_pieces(spark):
    """Two different merge paths can produce the same surface string
    (('a','##bc') and ('ab','##c') both yield 'abc'); the trainer must
    skip the duplicate so len(pieces) reflects the EFFECTIVE
    vocabulary, not an inflated count."""
    from datacamp_etl_spark.operators.bpe import wordpiece_train

    # 'abc' + heavy standalone prefixes/suffixes push both merge
    # orders into play across vocab sizes; whatever order wins, the
    # piece list must stay duplicate-free
    rows = (
        [(i, "abc abc") for i in range(8)]
        + [(100 + i, "ab") for i in range(4)]
        + [(200 + i, "bc") for i in range(4)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for size in (6, 8, 10, 12, 16):
        pieces = wordpiece_train(docs, vocab_size=size)
        assert len(pieces) == len(set(pieces)), pieces


def test_fixture_wordpiece_vocab_matches_training(spark):
    """FIXTURE_WORDPIECE_V1 is wordpiece_train(sf0.001 documents,
    vocab_size=160) frozen as a literal for the registered query's
    oracle; re-derive it so the pinned copy cannot rot."""
    from datacamp_etl_spark.operators.bpe import (
        FIXTURE_WORDPIECE_V1,
        wordpiece_train,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert wordpiece_train(docs, vocab_size=160) == FIXTURE_WORDPIECE_V1


def test_wordpiece_word_greedy_longest_match():
    from datacamp_etl_spark.operators.bpe import wordpiece_word

    vocab = {"a", "ab", "b", "##b", "##c", "##bc"}
    assert wordpiece_word("abc", vocab) == ["ab", "##c"]   # longest first
    assert wordpiece_word("abbc", vocab) == ["ab", "##bc"]
    assert wordpiece_word("ad", vocab) == ["[UNK]"]        # whole-word UNK


def test_wordpiece_encode_counts_and_roundtrip(spark):
    from datacamp_etl_spark.operators.bpe import (
        wordpiece_encode,
        wordpiece_train,
    )

    rows = [
        (1, "hello hello world"),
        (2, "hello world world"),
        (3, "unseenqz hello"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pieces = wordpiece_train(docs, vocab_size=40)
    out = {r["doc_id"]: r for r in wordpiece_encode(docs, pieces).collect()}
    assert out[1]["n_words"] == 3 and out[1]["n_unk"] == 0
    # every char of the corpus is in the inventory -> no UNK anywhere
    assert all(r["n_unk"] == 0 for r in out.values())
    # stripping ## and re-joining words reconstructs the normalized text
    for did, text in [(1, "hello hello world"), (2, "hello world world")]:
        toks = out[did]["tokens_str"].split(" ")
        words, cur = [], ""
        for t in toks:
            if t.startswith("##"):
                cur += t[2:]
            else:
                if cur:
                    words.append(cur)
                cur = t
        words.append(cur)
        assert " ".join(words) == text
    # with a tiny vocab the rare word goes [UNK] but known words don't
    char_only = wordpiece_train(docs.where("doc_id < 3"), vocab_size=1)
    out3 = {
        r["doc_id"]: r
        for r in wordpiece_encode(docs, char_only).collect()
    }
    assert out3[3]["n_unk"] >= 1


def test_wordpiece_encode_layout_deterministic(spark):
    from datacamp_etl_spark.operators.bpe import (
        wordpiece_encode,
        wordpiece_train,
    )

    rows = [(i, f"token{i % 7} shared words here") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pieces = wordpiece_train(docs, vocab_size=60)
    a = sorted(map(tuple, wordpiece_encode(docs, pieces).collect()))
    b = sorted(
        map(tuple, wordpiece_encode(docs.repartition(11), pieces).collect())
    )
    assert a == b
