"""Property tests for operators/bpe: the iterative merge loop against a
pure-Python reference implementation of Sennrich et al. BPE (leftmost
non-overlapping merges on the word-frequency table)."""

from __future__ import annotations

from collections import Counter

import pytest


def _ref_bpe(word_counts: dict[str, int], rounds: int):
    """Independent reference: list-of-symbols state, explicit leftmost
    non-overlapping merge — no string/delimiter tricks shared with the
    implementation under test."""
    state = {w: [list(w), n] for w, n in word_counts.items()}
    merges = []
    for r in range(1, rounds + 1):
        counts = Counter()
        for syms, n in state.values():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += n
        if not counts:
            break
        # deterministic tie-break: count DESC then pair ASC
        top_n = max(counts.values())
        best_pair = min(p for p, c in counts.items() if c == top_n)
        merges.append((r, best_pair[0], best_pair[1], top_n))
        a, b = best_pair
        for w, (syms, n) in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w][0] = out
    vocab = Counter()
    for syms, n in state.values():
        for s in syms:
            vocab[s] += n
    return merges, dict(vocab)


@pytest.mark.parametrize(
    "texts",
    [
        ["abab abab aa", "banana bandana", "aaa aaaa"],
        ["the theme there", "then the than", "ababab"],
        ["xyxy xyxy xyxy"],
    ],
)
def test_bpe_train_matches_reference(spark, texts):
    from oic_options_chains_spark.operators.bpe import bpe_train, bpe_vocab

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    words = Counter(w for t in texts for w in t.lower().split(" ") if w)
    ref_merges, ref_vocab = _ref_bpe(dict(words), rounds=4)

    got_merges = [
        (r.round, r.left_tok, r.right_tok, r.pair_n)
        for r in bpe_train(docs, rounds=4).collect()
    ]
    assert got_merges == ref_merges

    got_vocab = {
        r.token: r.total_n for r in bpe_vocab(docs, rounds=4).collect()
    }
    assert got_vocab == ref_vocab


def test_bpe_adjacent_occurrences_merge_in_one_round(spark):
    """The delimiter-protocol regression this module exists to avoid:
    'abab' must become [ab, ab] after merging (a, b) ONCE."""
    from oic_options_chains_spark.operators.bpe import bpe_train, bpe_vocab

    docs = spark.createDataFrame([(0, "abab")], "doc_id int, text string")
    merges = bpe_train(docs, rounds=1).collect()
    assert [(m.left_tok, m.right_tok, m.pair_n) for m in merges] == [("a", "b", 2)]
    vocab = {r.token: r.total_n for r in bpe_vocab(docs, rounds=1).collect()}
    assert vocab == {"ab": 2}
