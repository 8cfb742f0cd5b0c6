"""Streaming delta-vs-base media screen
(streaming/incremental_screen_stream): the banded screen runs
stream-static per micro-batch against the materialized epoch index with
no state, so the streamed hit set must equal the batch hits form on the
same delta under ANY chunking — and the pigeonhole exactness guarantee
holds across micro-batches trivially (no cross-batch memory)."""

from __future__ import annotations

import json

import pytest

# full-profile only (r16): scale-heavy suite moved out of the driver's
# default pytest budget; tools/run_suite.py (-m "") still runs it
pytestmark = pytest.mark.full
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oic_options_chains_spark.operators.phash import (
    ahash_band_table,
    incremental_screen_hits,
    materialize_epoch_index,
)
from oic_options_chains_spark.sources.registry import load_table
from oic_options_chains_spark.streaming.incremental_screen_stream import (
    streaming_incremental_screen,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


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
        streaming_incremental_screen(stream, base_index, **kwargs)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "availableNow drain exceeded 300s"
    return spark.read.parquet(out)


def test_streamed_hits_equal_batch_under_chunking(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "text")
    idx_path = str(tmp_path / "epoch_idx")
    materialize_epoch_index(base, idx_path)
    idx = spark.read.parquet(idx_path)

    # the delta: case-folded re-uploads of every fifth document (the
    # q_ahash_incremental corpus), streamed in 3 interleaved chunks
    delta_rows = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.upper("text").alias("text"),
        )
        .orderBy("doc_id")
        .collect()
    )
    chunks = [delta_rows[i::3] for i in range(3)]

    got = {
        (r.delta_id, r.base_id, r.hamming)
        for r in _run_stream(spark, tmp_path, chunks, idx).collect()
    }
    delta = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.upper("text").alias("text"),
    )
    want = {
        (r.delta_id, r.base_id, r.hamming)
        for r in incremental_screen_hits(
            idx, ahash_band_table(delta)
        ).collect()
    }
    assert got == want
    assert len(want) > 0  # the re-uploads do hit their sources


def test_hot_tier_is_exercised_and_exact(spark, tmp_path):
    """A planted hot bucket (many near-identical base images) must pass
    through the sub-band tier per micro-batch without losing the true
    sibling — the frozen-from-base tier decision at work."""
    prefix = "the same leading template sentence for every single doc "
    base = spark.createDataFrame(
        [(i, prefix + f"tail {i} " + "x" * (i % 7)) for i in range(60)],
        ["doc_id", "text"],
    )
    idx_path = str(tmp_path / "epoch_idx")
    materialize_epoch_index(base, idx_path)
    idx = spark.read.parquet(idx_path)
    delta_rows = (
        base.filter(F.col("doc_id") % 3 == 0)
        .select((F.col("doc_id") + 1000).alias("doc_id"), F.upper("text").alias("text"))
        .collect()
    )
    chunks = [delta_rows[0::2], delta_rows[1::2]]
    # cap=0 forces EVERY bucket through the hot sub-band tier
    got = {
        (r.delta_id, r.base_id, r.hamming)
        for r in _run_stream(
            spark, tmp_path, chunks, idx, hot_bucket_cap=0
        ).collect()
    }
    delta = base.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"),
        F.upper("text").alias("text"),
    )
    want = {
        (r.delta_id, r.base_id, r.hamming)
        for r in incremental_screen_hits(
            idx, ahash_band_table(delta), hot_bucket_cap=0
        ).collect()
    }
    assert got == want and got


def test_contract_checks_are_real_exceptions(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents")
    src = tmp_path / "evsrc"
    src.mkdir()
    (src / "f0.json").write_text("")
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    with pytest.raises(TypeError, match="streaming relation"):
        streaming_incremental_screen(d, d)
    with pytest.raises(TypeError, match="static"):
        streaming_incremental_screen(stream, stream)
    with pytest.raises(ValueError, match="contract columns"):
        streaming_incremental_screen(stream, d)
