"""Round 15 (VERDICT r14 item 5): the streaming MinHash routing as ONE
end-to-end artifact. Round 14 shipped the candidate screen (streamed)
and the Jaccard verify (batch) individually tested, with the routing
containment pinned — but no single composition draining a stream into
the batch verify and asserting the final dup relation equals the batch
operator's. This runs screen -> drain -> verify end-to-end at the
bench SF (sf0.1 documents, 5000 docs / 1000-doc delta) and pins exact
row-set equality, plus the candidates= entry guard.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oic_options_chains_spark.operators.minhash import (
    incremental_lsh_dedup,
    materialize_epoch_band_index,
)
from oic_options_chains_spark.sources.registry import load_table
from oic_options_chains_spark.streaming.neardup_screen_stream import (
    streaming_minhash_candidate_screen,
)

pytestmark = [pytest.mark.parity, pytest.mark.full]  # sf0.1-sized: full-profile only

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

SF01 = "/root/testdata/sf0.1"


def _rows(df):
    return {(r.doc_id, r.kept, r.dup_of, r.jaccard_bp) for r in df.collect()}


def test_screen_then_verify_equals_batch_operator(spark, tmp_path):
    base = load_table(spark, SF01, "documents").select("doc_id", "text")
    # re-uploads of every fifth document under fresh ids — the r14
    # fixture shape, at the bench SF
    delta = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    idx_path = str(tmp_path / "idx")
    materialize_epoch_band_index(base, idx_path)
    idx = spark.read.parquet(idx_path)

    # live half: drain the delta through the streamed candidate screen
    # in 3 arbitrary chunks
    src = tmp_path / "src"
    src.mkdir()
    rows = delta.orderBy("doc_id").collect()
    step = -(-len(rows) // 3)
    for i in range(3):
        part = rows[i * step : (i + 1) * step]
        (src / f"f{i}.json").write_text(
            "\n".join(
                json.dumps({"doc_id": r.doc_id, "text": r.text})
                for r in part
            )
        )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    out = str(tmp_path / "cand")
    q = (
        streaming_minhash_candidate_screen(stream, idx)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(600), "availableNow drain exceeded 600s"
    frontier = spark.read.parquet(out)

    # batch half: exact-verify ONLY the drained frontier
    composed = incremental_lsh_dedup(
        base, delta, base_index=idx, candidates=frontier
    )
    batch = incremental_lsh_dedup(base, delta, base_index=idx)
    got, want = _rows(composed), _rows(batch)
    assert got == want
    # the fixture is non-vacuous: re-uploaded docs must actually dedup
    assert sum(1 for r in want if r[1] == 0) > 0


def test_candidates_entry_guard(spark):
    base = spark.createDataFrame([(0, "a b c d e")], ["doc_id", "text"])
    bad = spark.createDataFrame([(1, 2)], ["x", "y"])
    with pytest.raises(ValueError, match="screen contract columns"):
        incremental_lsh_dedup(base, base, candidates=bad)


def test_empty_frontier_keeps_everything(spark):
    """A frontier with zero candidate pairs must still return one
    kept=1 row per delta doc (the left join back to the delta), not an
    empty relation."""
    base = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon doc {i}") for i in range(5)],
        ["doc_id", "text"],
    )
    delta = spark.createDataFrame(
        [(100, "totally different words nothing shared here at all")],
        ["doc_id", "text"],
    )
    empty = spark.createDataFrame([], "delta_id long, base_id long")
    out = _rows(incremental_lsh_dedup(base, delta, candidates=empty))
    assert out == {(100, 1, None, None)}
