"""Property check: the array-side Viterbi DP picks exactly the
segmentation a brute-force enumeration of ALL segmentations picks,
under the (score, lens lex-desc) total order — the prefix-monotonicity
argument in operators/segment.py, verified empirically."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from oic_options_chains_spark.operators.segment import maxmatch_segment


def _enumerate(word: str, vocab: set[str], max_len: int = 4):
    """All (score, lens) over every segmentation; single chars free."""
    out = []

    def rec(pos, score, lens):
        if pos == len(word):
            out.append((score, lens))
            return
        for L in range(1, max_len + 1):
            if pos + L > len(word):
                break
            if L > 1 and word[pos : pos + L] not in vocab:
                continue
            rec(pos + L, score + L * L, lens + [L])

    rec(0, 0, [])
    return out


def _best(word, vocab):
    return max(_enumerate(word, vocab), key=lambda sl: (sl[0], sl[1]))


@settings(max_examples=12, deadline=None)
@given(
    words=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=9),
        min_size=1,
        max_size=6,
        unique=True,
    ),
    vocab=st.sets(
        st.text(alphabet="abc", min_size=2, max_size=4), min_size=0, max_size=8
    ),
)
def test_dp_matches_bruteforce(spark, words, vocab):
    w = spark.createDataFrame([(x, 1) for x in words], "word string, n bigint")
    v = spark.createDataFrame(
        [(p,) for p in sorted(vocab)] or [("\x00",)], "piece string"
    )
    got = {r["word"]: r for r in maxmatch_segment(w, v).collect()}
    for word in words:
        score, lens = _best(word, vocab)
        r = got[word]
        assert r["score"] == score, (word, r["pieces"])
        pieces, pos = [], 0
        for L in lens:
            pieces.append(word[pos : pos + L])
            pos += L
        assert r["pieces"] == " ".join(pieces), (word, r["pieces"], pieces)
        assert r["n_pieces"] == len(lens)
