"""Streaming delta-vs-base media dedup: screen each micro-batch of a
live crawl against YESTERDAY'S corpus — the materialized aHash epoch
index — as it arrives.

This is the second dedup family that streams STATELESSLY (after
streaming/decontam_stream.py): the reference side is an epoch artifact
(operators/phash.materialize_epoch_index — frozen until the next epoch
re-materializes it), so the whole screen — per-row hashing, two-tier
banded bucket join, exact Hamming verify — is stateless projections
plus a stream-STATIC equi-join. No keyed state, no watermark: whether
an incoming image duplicates the BASE depends only on itself and the
(static) index, so batch 7's verdicts cannot depend on batches 1-6.
Contrast streaming/neardup_stream.py, where the reference set IS the
stream's own past and bucket ownership must live in
``applyInPandasWithState`` — the two operators own the two halves of a
production media pipeline: incoming-vs-base here, incoming-vs-incoming
there.

The output is the raw verified-hit relation (delta_id, base_id,
hamming) in append mode — the batch operator's pre-argmin output
(operators/phash.incremental_screen_hits). The per-image best-match
verdict (a row_number window over delta_id) is not append-streamable
and belongs downstream, where q_ahash_incremental's batch form already
does it. Semantics equal the batch screen by construction: the SAME
hits plan runs per micro-batch, rows are screened independently, so
chunking cannot change any hit (tests/test_incremental_screen_stream.py
pins streamed == batch under any chunking).

Hot-bucket note: the two-tier split derives its hot keys from the BASE
index only (a static aggregation, identical every micro-batch), so the
tier decision is frozen for the epoch — a skewed incoming batch cannot
flip join-key shapes mid-stream."""

from __future__ import annotations

from pyspark.sql import DataFrame

from oic_options_chains_spark.operators.phash import (
    ahash_band_table,
    hot_bucket_keys,
    incremental_screen_hits,
)


def streaming_incremental_screen(
    stream_docs: DataFrame,
    base_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    hot_bucket_cap: int = 1024,
) -> DataFrame:
    """(delta_id, base_id, hamming) append-mode verified hits of a
    STREAMING document/image relation against a STATIC materialized
    epoch index (the (__id, __bands) relation
    :func:`operators.phash.ahash_band_table` produces, e.g. read back
    from :func:`operators.phash.materialize_epoch_index`'s parquet).

    ``stream_docs`` must be streaming and ``base_index`` static — a
    streaming reference would make the bucket join stream-stream, which
    is exactly the shape this operator exists to avoid (and Spark would
    demand watermarks neither side semantically has)."""
    if not stream_docs.isStreaming:
        raise TypeError(
            "stream_docs must be a streaming relation; for batch deltas "
            "use operators/phash.ahash_incremental"
        )
    if base_index.isStreaming:
        raise TypeError("base_index must be static (the epoch artifact)")
    missing = {"__id", "__bands"} - set(base_index.columns)
    if missing:
        raise ValueError(
            f"base_index lacks the ahash_band_table contract columns "
            f"{sorted(missing)}; got {base_index.columns}"
        )
    base_h = base_index.select("__id", "__bands")
    # the tier split is frozen for the epoch, so compute it ONCE at
    # stream construction and checkpoint it (a static subplan inside a
    # streaming query is otherwise re-evaluated every micro-batch —
    # that's a full index explode + aggregation per trigger). The hot
    # relation holds only over-cap buckets, so the eager materialization
    # is tiny; the remaining per-batch base-side cost is the index scan
    # + explode feeding the bucket join, with no aggregation.
    hot = hot_bucket_keys(base_h, hot_bucket_cap).localCheckpoint(eager=True)
    delta_h = ahash_band_table(stream_docs, id_col=id_col, text_col=text_col)
    return incremental_screen_hits(
        base_h,
        delta_h,
        max_hamming=max_hamming,
        hot_bucket_cap=hot_bucket_cap,
        hot=hot,
    )
