"""Property-based checks for the round-6 second-wave operators: Spark
implementations must agree with independent brute-force Python
references on arbitrary small corpora, not only the registry fixtures."""

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.chunking import (
    interleave_media_segments,
    pack_grouped_stream_offsets,
)
from oic_options_chains_spark.operators.ranking import phrase_match

_word = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_word, min_size=1, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=8)


@settings(max_examples=12, deadline=None)
@given(_corpus)
def test_interleave_conserves_tokens(spark, docs):
    """Text-segment token counts sum to the doc's token count; media
    placeholders sit strictly between text segments (never first or
    last); seg_idx is dense per doc."""
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id bigint, text string"
    )
    out = interleave_media_segments(df, tokens_per_seg=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in enumerate(docs):
        rows = sorted(by_doc[doc_id], key=lambda r: r["seg_idx"])
        n_tok = len(text.split(" "))
        assert sum(r["n_tokens"] for r in rows if r["kind"] == "text") == n_tok
        kinds = [r["kind"] for r in rows]
        assert kinds[0] == "text" and kinds[-1] == "text"
        assert all(k == ("text" if i % 2 == 0 else "image")
                   for i, k in enumerate(kinds))
        assert [r["seg_idx"] for r in rows] == list(range(len(rows)))
        # rebuilding the text from the segments is lossless
        rebuilt = " ".join(r["content"] for r in rows if r["kind"] == "text")
        assert rebuilt == text.lower()


@settings(max_examples=12, deadline=None)
@given(_corpus)
def test_grouped_packing_keeps_documents_contiguous(spark, docs):
    """Within a shard's stream order, each document's segments occupy
    one contiguous offset range, in seg_idx order."""
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id bigint, text string"
    )
    segs = interleave_media_segments(df, tokens_per_seg=4).select(
        "doc_id", "seg_idx", "n_tokens"
    )
    packed = pack_grouped_stream_offsets(segs, context=8, n_shards=2).collect()
    by_doc = {}
    for r in packed:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["seg_idx"])
        assert len({r["shard"] for r in rows}) == 1
        for a, b in zip(rows, rows[1:]):
            assert b["stream_start"] == a["stream_start"] + a["n_tokens"]
        for r in rows:
            assert r["seq_index"] == r["stream_start"] // 8
            assert r["seq_offset"] == r["stream_start"] % 8


@settings(max_examples=12, deadline=None)
@given(_corpus, st.tuples(_word, _word))
def test_phrase_match_agrees_with_python(spark, docs, phrase):
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_matches"], r["first_pos"])
        for r in phrase_match(df, list(phrase)).collect()
    }
    want = {}
    for doc_id, text in enumerate(docs):
        toks = text.lower().split(" ")
        hits = [
            i
            for i in range(len(toks) - 1)
            if toks[i] == phrase[0] and toks[i + 1] == phrase[1]
        ]
        if hits:
            want[doc_id] = (len(hits), hits[0])
    assert got == want


def test_suppression_flags_reference(spark):
    """k-anonymity flags against a Counter reference on a fixed grid."""
    from oic_options_chains_spark.operators.privacy import k_anonymity_cells

    rows = [(i, i % 3, i % 7, (i * i) % 5) for i in range(60)]
    df = spark.createDataFrame(rows, "rid bigint, a int, b int, s int")
    cells = {
        (r["a"], r["b"]): r
        for r in k_anonymity_cells(df, ["a", "b"], F.col("s"), k=3, l=2).collect()
    }
    sizes = Counter((i % 3, i % 7) for i in range(60))
    distinct = {}
    for i in range(60):
        distinct.setdefault((i % 3, i % 7), set()).add((i * i) % 5)
    assert set(cells) == set(sizes)
    for key, r in cells.items():
        assert r["n_rows"] == sizes[key]
        assert r["l_distinct"] == len(distinct[key])
        assert r["k_anonymous"] == int(sizes[key] >= 3)
        assert r["l_diverse"] == int(len(distinct[key]) >= 2)
