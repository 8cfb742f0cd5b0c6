"""Streaming MinHash candidate screen (round 14, VERDICT r13 item 4):
the stream-static half of incremental text dedup. Pins:

- the per-row band-key expression (minhash_band_keys_expr) is
  bit-identical to the relational minhash_band_keys rows — including
  short docs (no shingles -> no keys), duplicate shingles, and
  double-space token edge cases;
- streamed candidates == the batch band-join candidate set under ANY
  chunking (stateless stream-static join against the frozen epoch
  index — no cross-batch memory);
- the routing guarantee: every base doc the batch screen verifies as a
  duplicate source arrived through the streamed candidate frontier;
- entry guards: streaming/static sides enforced, and an index
  materialized with a different banding is rejected via its metadata
  (it would otherwise silently emit nothing).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oic_options_chains_spark.operators.minhash import (
    doc_shingles,
    incremental_lsh_dedup,
    materialize_epoch_band_index,
    minhash_band_keys,
    minhash_band_keys_expr,
)
from oic_options_chains_spark.sources.registry import load_table
from oic_options_chains_spark.streaming.neardup_screen_stream import (
    streaming_minhash_candidate_screen,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _batch_candidates(spark, idx, delta):
    bands = minhash_band_keys(
        doc_shingles(delta, "doc_id", "text", distinct=False), "doc_id", 8, 4
    )
    return {
        (r.delta_id, r.base_id)
        for r in bands.alias("d")
        .join(idx.alias("b"), on=["band", "band_key"])
        .select(
            F.col("d.doc_id").alias("delta_id"),
            F.col("b.doc_id").alias("base_id"),
        )
        .distinct()
        .collect()
    }


def _run_stream(spark, tmp_path, chunks, base_index, **kwargs):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for i, chunk in enumerate(chunks):
        (src / f"f{i}.json").write_text(
            "\n".join(
                json.dumps({"doc_id": r.doc_id, "text": r.text})
                for r in chunk
            )
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        streaming_minhash_candidate_screen(stream, base_index, **kwargs)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "availableNow drain exceeded 300s"
    return spark.read.parquet(out)


def _delta(d):
    # re-uploads of every fifth document under fresh ids, plus a doc
    # too short to shingle (must be silently keyless, not an error)
    return d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), F.col("text")
    )


def test_expr_band_keys_equal_relational(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "alpha beta gamma alpha beta gamma"),  # duplicate shingles
            (2, "too short"),  # < 3 tokens: no shingles, no keys
            (3, ""),
            (4, "Mixed CASE tokens keep LOWERING rules intact"),
            (5, "double  space   tokens split into empties exactly"),
        ],
        ["doc_id", "text"],
    )
    want = {
        (r.doc_id, r.band, r.band_key)
        for r in minhash_band_keys(
            doc_shingles(docs, "doc_id", "text", distinct=False),
            "doc_id", 8, 4,
        ).collect()
    }
    got = {
        (r.doc_id, r.band, r.band_key)
        for r in docs.select(
            "doc_id",
            minhash_band_keys_expr(F.col("text")).alias("__dk"),
        )
        .filter(F.col("__dk").isNotNull())
        .select("doc_id", F.posexplode("__dk").alias("band", "band_key"))
        .collect()
    }
    assert got == want and got
    assert not any(d in {2, 3} for d, _, _ in got), "short docs keyless"


def test_streamed_candidates_equal_batch_under_chunking(
    spark, sf_dir, tmp_path
):
    d = load_table(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 10 < 8).select("doc_id", "text")
    idx_path = str(tmp_path / "epoch_idx")
    materialize_epoch_band_index(base, idx_path)
    idx = spark.read.parquet(idx_path)

    delta = _delta(d)
    delta_rows = delta.orderBy("doc_id").collect()
    chunks = [delta_rows[i::3] for i in range(3)]

    got = {
        (r.delta_id, r.base_id)
        for r in _run_stream(spark, tmp_path, chunks, idx).collect()
    }
    want = _batch_candidates(spark, idx, delta)
    assert got == want
    assert len(want) > 0  # the re-uploads do hit their sources

    # chunking invariance the stateless argument promises: one chunk
    # produces the identical candidate set
    (tmp_path / "one").mkdir()
    one = {
        (r.delta_id, r.base_id)
        for r in _run_stream(
            spark, tmp_path / "one", [delta_rows], idx
        ).collect()
    }
    assert one == want


def test_stream_frontier_covers_batch_verified_dups(spark, sf_dir, tmp_path):
    """The documented routing: candidates stream, verify runs in batch.
    Every (delta, base) pair the batch screen verifies as a duplicate
    must have arrived through the streamed frontier."""
    d = load_table(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 10 < 8).select("doc_id", "text")
    idx_path = str(tmp_path / "epoch_idx")
    materialize_epoch_band_index(base, idx_path)
    idx = spark.read.parquet(idx_path)
    delta = _delta(d)
    delta_rows = delta.orderBy("doc_id").collect()

    streamed = {
        (r.delta_id, r.base_id)
        for r in _run_stream(
            spark, tmp_path, [delta_rows[0::2], delta_rows[1::2]], idx
        ).collect()
    }
    verdicts = incremental_lsh_dedup(
        base, delta, min_jaccard_bp=2000, base_index=idx
    ).collect()
    dup_pairs = {
        (r.doc_id, r.dup_of) for r in verdicts if r.kept == 0
    }
    assert dup_pairs, "re-uploads must verify as dups"
    assert dup_pairs <= streamed


def test_entry_guards(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    base = d.filter(F.col("doc_id") % 10 < 8).select("doc_id", "text")
    idx_path = str(tmp_path / "epoch_idx")
    materialize_epoch_band_index(base, idx_path)
    idx = spark.read.parquet(idx_path)

    with pytest.raises(TypeError, match="must be a streaming"):
        streaming_minhash_candidate_screen(base, idx)

    src = tmp_path / "s"
    src.mkdir()
    (src / "f0.json").write_text(json.dumps({"doc_id": 1, "text": "a b c d"}))
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    idx.write.parquet(str(tmp_path / "i"))
    with pytest.raises(TypeError, match="must be static"):
        streaming_minhash_candidate_screen(
            stream,
            spark.readStream.schema(idx.schema).parquet(str(tmp_path / "i")),
        )
    with pytest.raises(ValueError, match="contract"):
        streaming_minhash_candidate_screen(stream, idx.drop("band_key"))

    mism_path = str(tmp_path / "epoch_idx_h12")
    materialize_epoch_band_index(base, mism_path, num_hashes=12, rows_per_band=6)
    mism = spark.read.parquet(mism_path)
    with pytest.raises(ValueError, match="num_hashes=12"):
        streaming_minhash_candidate_screen(stream, mism)


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# texts drawn adversarially for tokenization parity: empty strings,
# runs of spaces (empty tokens), mixed case, punctuation glued to
# words, repeated words (duplicate shingles), and length straddling
# the 3-token shingle threshold
_word = st.text(
    alphabet="abcXYZ0.,!'-", min_size=1, max_size=6
)
_text = st.lists(
    st.one_of(_word, st.just(""), st.just(" ")), min_size=0, max_size=12
).map(" ".join)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_text, min_size=1, max_size=30))
def test_expr_band_keys_equal_relational_property(spark, texts):
    """Hypothesis twin of the fixed-corpus parity pin: for ARBITRARY
    texts the per-row expression path and the relational groupBy path
    must produce the identical (doc, band, band_key) set — including
    docs that shingle to nothing on both sides."""
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    want = {
        (r.doc_id, r.band, r.band_key)
        for r in minhash_band_keys(
            doc_shingles(docs, "doc_id", "text", distinct=False),
            "doc_id", 8, 4,
        ).collect()
    }
    got = {
        (r.doc_id, r.band, r.band_key)
        for r in docs.select(
            "doc_id", minhash_band_keys_expr(F.col("text")).alias("dk")
        )
        .filter(F.col("dk").isNotNull())
        .select("doc_id", F.posexplode("dk").alias("band", "band_key"))
        .collect()
    }
    assert got == want
