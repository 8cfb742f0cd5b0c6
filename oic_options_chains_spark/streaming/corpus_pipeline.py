"""Streaming corpus admission: the training-data front door as one
Structured Streaming pipeline — quality gates, then cross-batch
content dedup, then an append-only sink.

Composition (all pieces are the batch operators, unchanged):
- gates: operators/text.quality_metrics + operators/repetition
  .repetition_metrics — pure column expressions, so they run inside the
  stream's scan stage with no state;
- dedup: streaming/stateful.first_seen_filter keyed on the content
  fingerprint — keyed state remembers every admitted fingerprint across
  micro-batches, so a re-crawled duplicate is swallowed even if it
  arrives days later (the batch anti-join can't do that on an
  append-only sink);
- sink: parquet append. Admitted rows are immutable; replaying a batch
  after a crash re-offers the same fingerprints and the state swallows
  them — exactly-once admission from at-least-once delivery.

Scale: state is one long per admitted fingerprint, hash-partitioned by
fingerprint; at 10^10 documents that is the same state budget a
streaming dedup holds anywhere, and ``first_seen_filter``'s TTL bounds
it when the corpus is windowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from oic_options_chains_spark.operators.repetition import repetition_metrics
from oic_options_chains_spark.operators.text import fingerprint, quality_metrics
from oic_options_chains_spark.streaming.stateful import first_seen_filter

DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), False),
    ]
)

ADMITTED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("fingerprint", T.StringType(), True),
        T.StructField("n_tokens", T.LongType(), True),
    ]
)


def admit_documents(
    stream: DataFrame,
    min_tokens: int = 3,
    max_tokens: int = 1000,
    max_top_token_bp: int = 5000,
    max_dup_bigram_bp: int = 8000,
) -> DataFrame:
    """Quality-gate then first-seen-dedup a document stream.

    Gates: token-count window, top-token coverage, duplicate-bigram
    fraction (the Gopher-style repetition screens). Survivors are
    deduped by content fingerprint with cross-batch memory.
    """
    q = quality_metrics(F.col("text"))
    r = repetition_metrics(F.col("text"))
    gated = (
        stream.select(
            "doc_id",
            fingerprint(F.col("text")).alias("fingerprint"),
            q["n_tokens"].alias("n_tokens"),
            r["top_token_bp"].alias("top_token_bp"),
            r["dup_bigram_bp"].alias("dup_bigram_bp"),
        )
        .filter(
            F.col("n_tokens").between(min_tokens, max_tokens)
            & (F.col("top_token_bp") < max_top_token_bp)
            & (F.col("dup_bigram_bp") < max_dup_bigram_bp)
        )
        .select("doc_id", "fingerprint", "n_tokens")
    )
    return first_seen_filter(gated, ["fingerprint"])


def run_corpus_admission_once(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    **gate_kwargs,
) -> None:
    """One AvailableNow drain of the admission pipeline: new parquet
    files under ``source_dir`` are gated, deduped against ALL previously
    admitted content (keyed state in the checkpoint), and appended."""
    stream = spark.readStream.schema(DOCUMENT_SCHEMA).parquet(source_dir)
    admitted = admit_documents(stream, **gate_kwargs)
    q = (
        admitted.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def corpus_build_admission(stream: DataFrame) -> DataFrame:
    """The STREAMING twin of ``q_corpus_build``'s admission stages,
    gate-for-gate: token window 5..1000, stopword floor >= 200 bp,
    top-token repetition cap < 5000 bp, then content-fingerprint dedup
    with a deterministic min-doc_id winner
    (``stateful.first_seen_min_filter``). Emits (doc_id, fingerprint,
    n_tokens) — the exact admitted set the batch flagship computes,
    provided ingest files arrive in doc_id-ascending chunks (then the
    streamed first-seen winner equals the batch global min per
    fingerprint; the equivalence test pins this bit-for-bit)."""
    from oic_options_chains_spark.streaming.stateful import first_seen_min_filter

    q = quality_metrics(F.col("text"))
    r = repetition_metrics(F.col("text"))
    gated = (
        stream.select(
            "doc_id",
            fingerprint(F.col("text")).alias("fingerprint"),
            q["n_tokens"].alias("n_tokens"),
            q["stop_ratio_bp"].alias("stop_ratio_bp"),
            r["top_token_bp"].alias("top_token_bp"),
        )
        .filter(
            F.col("n_tokens").between(5, 1000)
            & (F.col("stop_ratio_bp") >= 200)
            & (F.col("top_token_bp") < 5000)
        )
        .select("doc_id", "fingerprint", "n_tokens")
    )
    return first_seen_min_filter(gated, ["fingerprint"], "doc_id")


def run_corpus_build_once(
    spark: SparkSession,
    source_dir: str,
    admitted_dir: str,
    checkpoint_dir: str,
) -> None:
    """One AvailableNow drain of the streaming corpus build's admission
    leg into an append-only parquet table. Replays are no-ops: the
    keyed fingerprint state swallows re-offered rows."""
    stream = spark.readStream.schema(DOCUMENT_SCHEMA).parquet(source_dir)
    q = (
        corpus_build_admission(stream)
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", admitted_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def finalize_corpus_build(spark: SparkSession, admitted_dir: str) -> DataFrame:
    """Epoch-close finalize over the streamed admitted table: the batch
    flagship's train split + sharded concat-split packing, unchanged
    (packing needs per-shard global cumulative sums, which an
    append-mode stream cannot emit incrementally — so the build runs
    admission in the stream and packs at epoch close, the standard
    lambda-free split). Output schema == ``q_corpus_build``."""
    from oic_options_chains_spark.operators.sampling import split_assign
    from oic_options_chains_spark.queries.corpus import pack_stream_offsets

    admitted = spark.read.schema(ADMITTED_SCHEMA).parquet(admitted_dir)
    train = admitted.filter(split_assign(F.col("doc_id")) == "train")
    return pack_stream_offsets(
        train.select("doc_id", "n_tokens"), context=256, n_shards=8
    )
