"""Property-based checks for the round-5 selection operators: the Spark
implementations must agree with brute-force Python references on
arbitrary small corpora, not just the handcrafted cases. The references
replicate the integer arithmetic independently (md5 buckets, add-1
smoothing, floor-scaled integer division)."""

import hashlib
from collections import Counter

from hypothesis import assume, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.dsir import (
    DSIR_BUCKETS,
    DSIR_SCALE,
    dsir_scores,
)
from oic_options_chains_spark.operators.lm import lm_quality_scores

_word = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "zz"])
_doc = st.lists(_word, min_size=1, max_size=6).map(" ".join)
_corpus = st.lists(
    st.tuples(_doc, st.booleans()), min_size=2, max_size=12
).filter(lambda rows: any(t for _, t in rows))


def _grams(text):
    toks = text.lower().split(" ")
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _bucket(gram, n_buckets):
    return int(hashlib.md5(gram.encode()).hexdigest()[:4], 16) % n_buckets


def _dsir_reference(rows):
    per_doc, c_raw, c_tgt = {}, Counter(), Counter()
    for doc_id, (text, is_tgt) in enumerate(rows):
        counts = Counter(_bucket(g, DSIR_BUCKETS) for g in _grams(text))
        per_doc[doc_id] = counts
        for b, t in counts.items():
            c_raw[b] += t
            if is_tgt:
                c_tgt[b] += t
    n_raw, n_tgt = sum(c_raw.values()), sum(c_tgt.values())
    ratio = {
        b: (DSIR_SCALE * (c_tgt[b] + 1) * (n_raw + DSIR_BUCKETS))
        // ((c_raw[b] + 1) * (n_tgt + DSIR_BUCKETS))
        for b in c_raw
    }
    out = {}
    for doc_id, counts in per_doc.items():
        n = sum(counts.values())
        out[doc_id] = (n, sum(t * ratio[b] for b, t in counts.items()) // n)
    return out


@settings(max_examples=10, deadline=None)
@given(rows=_corpus)
def test_dsir_scores_match_python_reference(spark, rows):
    df = spark.createDataFrame(
        [(i, text, tgt) for i, (text, tgt) in enumerate(rows)],
        "doc_id long, text string, is_tgt boolean",
    )
    got = {
        r.doc_id: (r.n_grams, r.dsir_score)
        for r in dsir_scores(df, F.col("is_tgt")).collect()
    }
    assert got == _dsir_reference(rows)


def _lm_reference(rows, scale=1 << 20):
    pairs_by_doc, c2 = {}, Counter()
    for doc_id, text in rows:
        toks = text.lower().split(" ")
        pairs = list(zip(toks, toks[1:]))
        pairs_by_doc[doc_id] = pairs
        c2.update(pairs)
    c1 = Counter()
    for (w1, _), n in c2.items():
        c1[w1] += n
    v = len(c1)
    out = {}
    for doc_id, pairs in pairs_by_doc.items():
        if not pairs:
            continue
        t = sum((scale * (c2[p] + 1)) // (c1[p[0]] + v) for p in pairs)
        out[doc_id] = (len(pairs), t // len(pairs))
    return out


@settings(max_examples=10, deadline=None)
@given(rows=st.lists(_doc, min_size=2, max_size=12))
def test_lm_scores_match_python_reference(spark, rows):
    indexed = list(enumerate(rows))
    assume(any(len(text.split(" ")) > 1 for _, text in indexed))
    df = spark.createDataFrame(indexed, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_bigrams, r.lm_score)
        for r in lm_quality_scores(df).collect()
    }
    assert got == _lm_reference(indexed)
