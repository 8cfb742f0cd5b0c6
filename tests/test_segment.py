"""Max-match segmentation semantics: the integer Viterbi objective
(sum of len^2, ties to longest first piece), the single-char fallback,
and the substring-vocabulary weighting."""

from __future__ import annotations

from oic_options_chains_spark.operators.segment import (
    maxmatch_segment,
    substring_vocab,
    word_freqs,
)


def _seg(spark, words_freqs, vocab_pieces):
    w = spark.createDataFrame(words_freqs, "word string, n bigint")
    v = spark.createDataFrame([(p,) for p in vocab_pieces], "piece string")
    return {r["word"]: r for r in maxmatch_segment(w, v).collect()}


def test_longer_pieces_win(spark):
    # 'the'+'ory' scores 9+9=18; 'theo'+'ry' scores 16+4=20 -> wins
    got = _seg(spark, [("theory", 1)], ["the", "ory", "theo", "ry"])
    assert got["theory"]["pieces"] == "theo ry"
    assert got["theory"]["score"] == 20
    assert got["theory"]["n_pieces"] == 2


def test_equal_score_tie_prefers_longest_first_piece(spark):
    # 'theo'+'ry' and 'th'+'eory' both score 20; lens [4,2] > [2,4]
    got = _seg(spark, [("theory", 1)], ["theo", "ry", "th", "eory"])
    assert got["theory"]["pieces"] == "theo ry"


def test_single_char_fallback_covers_oov(spark):
    got = _seg(spark, [("xyzw", 1)], ["the"])
    assert got["xyzw"]["pieces"] == "x y z w"
    assert got["xyzw"]["score"] == 4
    assert got["xyzw"]["n_pieces"] == 4


def test_mixed_vocab_and_fallback(spark):
    # only 'zw' in vocab: x y zw = 1+1+4
    got = _seg(spark, [("xyzw", 1)], ["zw"])
    assert got["xyzw"]["pieces"] == "x y zw"
    assert got["xyzw"]["score"] == 6


def test_vocab_counts_weight_by_word_frequency_and_occurrences(spark):
    docs = spark.createDataFrame(
        [(1, "abab abab ab"), (2, "abab")], "doc_id bigint, text string"
    )
    w = word_freqs(docs)
    v = {
        r["piece"]: r["piece_n"]
        for r in substring_vocab(w, min_freq=1).collect()
    }
    # 'ab' occurs twice inside 'abab' (freq 3) and once in 'ab' (freq 1)
    assert v["ab"] == 2 * 3 + 1
    assert v["abab"] == 3
    # 'ba' occurs once per 'abab'
    assert v["ba"] == 3


def test_word_length_cap(spark):
    docs = spark.createDataFrame(
        [(1, "short " + "x" * 17)], "doc_id bigint, text string"
    )
    words = {r["word"] for r in word_freqs(docs).collect()}
    assert words == {"short"}
