"""Streaming decontamination (streaming/decontam_stream): the banded
screen runs stream-static per micro-batch with no state, so the
streamed hit set must equal the batch operator's on the same corpus
under ANY chunking — and the screen's exact-dup guarantee holds across
micro-batches trivially (no cross-batch memory to lose it in)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from oic_options_chains_spark.operators.similarity import (
    cross_near_pairs_banded,
)
from oic_options_chains_spark.sources.registry import load_table
from oic_options_chains_spark.streaming.decontam_stream import (
    streaming_decontam,
)

SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)


def _run_stream(spark, tmp_path, chunks, ev):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for i, chunk in enumerate(chunks):
        (src / f"f{i}.json").write_text(
            "\n".join(
                json.dumps({"vec_id": r.vec_id, "embedding": list(map(float, r.embedding))})
                for r in chunk
            )
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = (
        streaming_decontam(stream, ev)
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
    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 10 == 0)
    tr_rows = emb.filter(F.col("vec_id") % 10 != 0).orderBy("vec_id").collect()
    chunks = [tr_rows[i::3] for i in range(3)]  # interleaved, id-unordered

    got = {
        (r.id_a, r.id_b, r.score_e6)
        for r in _run_stream(spark, tmp_path, chunks, ev).collect()
    }
    tr = emb.filter(F.col("vec_id") % 10 != 0)
    want = {
        (r.id_a, r.id_b, r.score_e6)
        for r in cross_near_pairs_banded(tr, ev, threshold=0.35).collect()
    }
    assert got == want
    assert len(want) > 0  # non-vacuous at gate scale


def test_streaming_rejects_streaming_eval_side(spark, sf_dir, tmp_path):
    import pytest

    emb = load_table(spark, sf_dir, "embeddings")
    src = tmp_path / "evsrc"
    src.mkdir()
    (src / "f0.json").write_text("")
    ev_stream = spark.readStream.schema(SCHEMA).json(str(src))
    # real exceptions, not asserts: the contract must hold under
    # python -O too (ADVICE r12)
    with pytest.raises(TypeError, match="static"):
        streaming_decontam(ev_stream, ev_stream)
    with pytest.raises(ValueError, match="broadcast"):
        streaming_decontam(ev_stream, emb, broadcast_reference=False)
