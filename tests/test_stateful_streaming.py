"""applyInPandasWithState first-seen dedup: state must survive ACROSS
micro-batches (the property the idempotent-sink pipelines don't need and
an append-only sink does)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from oic_options_chains_spark.streaming.stateful import first_seen_filter

SCHEMA = T.StructType(
    [
        T.StructField("k", T.StringType()),
        T.StructField("payload", T.LongType()),
    ]
)


def _write(path, rows):
    path.write_text("\n".join(json.dumps(r) for r in rows))


def test_first_seen_across_micro_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    # two files -> two micro-batches (maxFilesPerTrigger=1); key "B"
    # appears in both and must be emitted exactly once
    _write(src / "f1.json", [{"k": "A", "payload": 1}, {"k": "B", "payload": 2}])
    _write(src / "f2.json", [{"k": "B", "payload": 99}, {"k": "C", "payload": 3}])

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            first_seen_filter(stream, ["k"])
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    rows = spark.read.parquet(out).collect()
    assert sorted(r.k for r in rows) == ["A", "B", "C"]
    # B kept its first-arrival payload, not the later duplicate's
    assert {r.k: r.payload for r in rows}["B"] == 2

    # a later run over NEW files recovers keyed state from the checkpoint:
    # the duplicate "A" stays swallowed, only the new key emits
    _write(src / "f3.json", [{"k": "A", "payload": 7}, {"k": "D", "payload": 4}])
    run()
    rows2 = spark.read.parquet(out).collect()
    assert sorted(r.k for r in rows2) == ["A", "B", "C", "D"]
    assert {r.k: r.payload for r in rows2}["A"] == 1


def test_batch_internal_duplicates_collapse(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write(
        src / "f1.json",
        [{"k": "X", "payload": 1}, {"k": "X", "payload": 2}, {"k": "Y", "payload": 3}],
    )
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    q = (
        first_seen_filter(stream, ["k"])
        .writeStream.format("memory")
        .queryName("dup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM dup_sink").collect()
    assert sorted(r.k for r in rows) == ["X", "Y"]
