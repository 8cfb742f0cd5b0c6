"""Dictionary max-match segmentation: the INFERENCE half of a unigram
tokenizer (SentencePiece-style), complementing operators/bpe's merge
TRAINING. Each corpus word is segmented into vocabulary pieces by a
Viterbi pass that maximizes an integer objective — sum of len(piece)^2
(longer pieces win, the max-match criterion), ties broken by the
lexicographically largest piece-length sequence (longest FIRST piece).

Everything is exact integer arithmetic — no log-probabilities — so the
winning segmentation replays bit-identically on any engine: the DuckDB
oracle runs the same DP as an unrolled per-position CTE. The objective
is prefix-monotone (equal-score candidates at a position never extend
to a reordered pair: appending the same piece preserves both the score
order and the length-sequence order, since equal-sum length sequences
are never prefixes of each other), so the per-position argmax DP finds
the same winner exhaustive enumeration would.

Scale shape:
- Training-free: the vocabulary is the corpus-weighted substring
  frequency table (every 2..max_len-gram over the word-frequency
  relation), thresholded — one corpus-sized shuffle for word counts,
  one vocabulary-sized aggregation for piece counts, exactly the
  bpe.py layout.
- Candidate spans join the vocab on the piece string (hash shuffle on
  bounded-domain keys); the DP itself is ARRAY-SIDE per word (aggregate
  over positions with the word's edge list collected into one bounded
  array — max_word_len * (max_len-1) entries), so no per-position
  shuffle and no Python.
- Single-character steps are always available (the UNK-free fallback),
  so every position is reachable and the DP total-orders a unique
  winner per word.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_WORD_LEN = 16


def word_freqs(
    docs: DataFrame,
    text_col: str = "text",
    max_word_len: int = MAX_WORD_LEN,
) -> DataFrame:
    """(word, n) corpus word frequencies, capped at ``max_word_len``
    characters (longer tokens are URL-ish junk for a word segmenter —
    and the cap is what lets the oracle unroll the DP per position)."""
    return (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(
            (F.length("word") >= 1) & (F.length("word") <= max_word_len)
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def substring_vocab(
    words: DataFrame,
    min_len: int = 2,
    max_len: int = 4,
    min_freq: int = 50,
) -> DataFrame:
    """(piece, piece_n): corpus-weighted occurrence counts of every
    substring with length in [min_len, max_len]; the vocabulary is the
    pieces clearing ``min_freq``. Weighting is word frequency times
    in-word occurrences, all computed array-side before one
    piece-keyed aggregation."""
    wl = F.length("word")
    spans = F.flatten(
        F.transform(
            F.sequence(F.lit(0), wl - min_len),
            lambda i: F.filter(
                F.transform(
                    F.sequence(F.lit(min_len), F.lit(max_len)),
                    lambda L: F.when(
                        i + L <= wl, F.substring(F.col("word"), i + 1, L)
                    ),
                ),
                lambda p: p.isNotNull(),
            ),
        )
    )
    return (
        words.filter(wl >= min_len)
        .select(F.explode(spans).alias("piece"), F.col("n"))
        .groupBy("piece")
        .agg(F.sum("n").cast("bigint").alias("piece_n"))
        .filter(F.col("piece_n") >= min_freq)
    )


def maxmatch_segment(
    words: DataFrame,
    vocab: DataFrame,
    max_len: int = 4,
) -> DataFrame:
    """(word, n, pieces, n_pieces, score): the unique best segmentation
    of each word into vocab pieces (single characters always allowed),
    maximizing (sum of len^2, piece-length sequence lex-desc)."""
    wl = F.length("word")

    # candidate vocab spans per word: (s, e) half-open over characters
    cand = words.select(
        "word",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(wl - 2, F.lit(0))),
                    lambda i: F.filter(
                        F.transform(
                            F.sequence(F.lit(2), F.lit(max_len)),
                            lambda L: F.when(
                                (i + L <= wl) & (wl >= 2),
                                F.struct(
                                    i.cast("int").alias("s"),
                                    (i + L).cast("int").alias("e"),
                                    F.substring(
                                        F.col("word"), i + 1, L
                                    ).alias("piece"),
                                ),
                            ),
                        ),
                        lambda x: x.isNotNull(),
                    ),
                )
            )
        ).alias("sp"),
    ).select("word", "sp.s", "sp.e", "sp.piece")
    edges_v = (
        cand.join(vocab.select("piece"), "piece", "left_semi")
        .groupBy("word")
        .agg(F.collect_list(F.struct("s", "e")).alias("__edges"))
    )

    base = words.join(edges_v, "word", "left")
    edges = F.coalesce(
        F.col("__edges"), F.array().cast("array<struct<s:int,e:int>>")
    )

    # DP: acc[j+1] = best (score, lens) reaching position j. Position i
    # extends from i-1 by a single char (always legal, score +1) and
    # from every vocab edge ending at i; struct max compares score then
    # the length sequence, both exact integers.
    init = F.array(
        F.struct(
            F.lit(0).cast("bigint").alias("score"),
            F.array().cast("array<int>").alias("lens"),
        )
    )

    def step(acc, i):
        one = F.struct(
            (F.element_at(acc, i)["score"] + 1).alias("score"),
            F.concat(
                F.element_at(acc, i)["lens"], F.array(F.lit(1).cast("int"))
            ).alias("lens"),
        )
        via_vocab = F.transform(
            F.filter(edges, lambda ed: ed["e"] == i),
            lambda ed: F.struct(
                (
                    F.element_at(acc, ed["s"] + 1)["score"]
                    + ((i - ed["s"]) * (i - ed["s"])).cast("bigint")
                ).alias("score"),
                F.concat(
                    F.element_at(acc, ed["s"] + 1)["lens"],
                    F.array((i - ed["s"]).cast("int")),
                ).alias("lens"),
            ),
        )
        return F.concat(
            acc, F.array(F.array_max(F.concat(F.array(one), via_vocab)))
        )

    best = F.element_at(
        F.aggregate(F.sequence(F.lit(1), wl), init, step), wl + 1
    )

    # re-cut the word along the winning length sequence
    pieces = F.aggregate(
        best["lens"],
        F.struct(
            F.lit(0).alias("pos"),
            F.array().cast("array<string>").alias("arr"),
        ),
        lambda a, L: F.struct(
            (a["pos"] + L).alias("pos"),
            F.concat(
                a["arr"],
                F.array(F.substring(F.col("word"), a["pos"] + 1, L)),
            ).alias("arr"),
        ),
        lambda a: a["arr"],
    )

    return base.select(
        "word",
        "n",
        F.array_join(pieces, " ").alias("pieces"),
        F.size(best["lens"]).cast("bigint").alias("n_pieces"),
        best["score"].alias("score"),
    )
