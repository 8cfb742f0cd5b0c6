"""Streaming DSIR model maintenance: running target/raw bucket counts
accumulated per micro-batch, exactly-once by construction.

The batch side (operators/dsir.py) fits the importance model in one
pass; this is the streaming corollary for a corpus that ARRIVES as a
stream — each micro-batch's B-row bucket stats land in the model store,
so the selection model stays current without reprocessing history.

Replay safety differs from the HLL register table (sketch_stream.py) in
an instructive way: HLL MAX-merge is idempotent by lattice algebra, but
gram counts are ADDITIVE — merging the same batch twice would
double-count. Idempotency therefore comes from DETERMINISTIC BATCH
KEYING instead: each micro-batch writes its partial stats to
``batch=<batch_id>/`` with mode("overwrite"), and foreachBatch replays
reuse the same batch_id, so a retry overwrites its own previous attempt
bit-for-bit and the aggregate over batch directories is exactly-once.
This is the standard idempotent-additive-sink pattern; the reader
simply sums bucket-wise (``bucket_stats`` is mergeable by design).

State size: n_batches x B rows of integers — model-sized, never
data-sized. ``compact_model`` folds committed batch partials into one
``batch=compacted`` partial (itself keyed, itself idempotent) when the
directory count matters; correctness never depends on compaction
because addition is associative.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.dsir import (
    DSIR_BUCKETS,
    DSIR_SCALE,
    bucket_stats,
    hashed_gram_counts,
    ratios_from_stats,
)

_STATS_SCHEMA = "bucket int, c_raw bigint, c_tgt bigint"


def write_batch_stats(
    batch: DataFrame,
    target,
    model_dir: str,
    batch_id: int,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """One micro-batch's (bucket, c_raw, c_tgt) partial, written to its
    deterministic ``batch=<id>`` directory. Calling again with the same
    batch_id (an at-least-once retry) overwrites the same directory with
    the same rows — the replay no-op the foreachBatch contract needs."""
    stats = bucket_stats(
        hashed_gram_counts(batch, target, n_buckets, id_col, text_col)
    )
    stats.write.mode("overwrite").parquet(
        os.path.join(model_dir, f"batch={batch_id}")
    )


def run_incremental_dsir_model(
    spark: SparkSession,
    stream: DataFrame,
    target,
    model_dir: str,
    checkpoint_dir: str,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Drain a document stream into the model store (AvailableNow — the
    same cadence contract as the raw-zone loads)."""

    def process(batch: DataFrame, batch_id: int) -> None:
        write_batch_stats(
            batch, target, model_dir, batch_id, n_buckets, id_col, text_col
        )

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_model_stats(spark: SparkSession, model_dir: str) -> DataFrame:
    """(bucket, c_raw, c_tgt) summed over every committed batch partial
    — a model-sized read (n_batches x B rows in, B rows out)."""
    parts = spark.read.schema(_STATS_SCHEMA).parquet(
        os.path.join(model_dir, "batch=*")
    )
    return parts.groupBy("bucket").agg(
        F.sum("c_raw").cast("bigint").alias("c_raw"),
        F.sum("c_tgt").cast("bigint").alias("c_tgt"),
    )


def read_model_ratios(
    spark: SparkSession,
    model_dir: str,
    n_buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
) -> DataFrame:
    """The current (bucket, c_raw, c_tgt, ratio_sc) importance model —
    the identical arithmetic as the batch fit (ratios_from_stats is
    shared), so a model accumulated over N micro-batches equals the
    batch model over their union bit-for-bit."""
    return ratios_from_stats(read_model_stats(spark, model_dir), n_buckets, scale)


def compact_model(spark: SparkSession, model_dir: str) -> None:
    """Fold all committed batch partials into ``batch=compacted``.
    Runs between drains (single-maintainer contract, like the raw-zone
    retention jobs): summing partials is associative, so compaction
    changes nothing the reader can observe; it only bounds the
    directory count for long-lived streams."""
    import shutil

    # model-sized driver round-trip (<= n_buckets rows), tripwired like
    # the other audited bounded collects (SCALING.md ground rules)
    stats = read_model_stats(spark, model_dir).limit(65537).collect()
    assert len(stats) <= 65536, "bucket count exceeds the model-size bound"
    names = [n for n in os.listdir(model_dir) if n.startswith("batch=")]
    spark.createDataFrame(
        [(r.bucket, r.c_raw, r.c_tgt) for r in stats], _STATS_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(model_dir, "batch=compacted")
    )
    for n in names:
        if n != "batch=compacted":
            shutil.rmtree(os.path.join(model_dir, n), ignore_errors=True)
