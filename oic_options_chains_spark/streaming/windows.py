"""Watermarked event-time window aggregation — the Structured Streaming
face of the batch window queries (queries/events.py q_tumbling_window /
q_sliding_window).

Semantics (the contract the test locks):
- Event-time tumbling windows, counted per key.
- A watermark bounds state: windows stay open (and buffered in the state
  store) only until the watermark passes their end, then they are
  finalized, emitted once (append mode), and their state is dropped.
- Rows older than the watermark are DROPPED before aggregation — the
  late-data policy that keeps emitted results immutable, which is what
  an idempotent downstream sink (warehouse partition, message bus)
  needs. A pipeline that must not lose late rows routes them to a
  side channel instead (compare incremental.py's quarantine pattern).

Scale: state is O(open windows x keys), hash-partitioned by group key;
the watermark is what makes that bounded at 100 TB/day — without it the
state store grows with total history. Aggregation is the built-in
streaming hash aggregate (JVM, incremental checkpoints), not Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str,
    key_cols: Sequence[str] = (),
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time counts with a late-data watermark.

    Output: window_start, window_end, key_cols..., n. In append mode a
    window row is emitted exactly once, when the watermark passes the
    window end.
    """
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_duration).alias("win"), *key_cols
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            *key_cols,
            "n",
        )
    )


def sessionized_counts(
    stream: DataFrame,
    ts_col: str,
    key_cols: Sequence[str] = (),
    gap: str = "30 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Event-time SESSION windows: rows within ``gap`` of each other per
    key merge into one session (dynamic extent, unlike tumbling). The
    state store holds open sessions and merges them as rows arrive; the
    watermark closes a session once no row can extend it (its end + gap
    is behind the watermark), emits it exactly once, and drops its
    state — the same boundedness argument as windowed_counts, with
    session count instead of open windows.

    This is the streaming face of the batch q_session_gap query (lag +
    cumulative flag there, merging keyed state here).
    """
    return (
        stream.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"), *key_cols
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            *key_cols,
            "n",
        )
    )


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "15 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Stream-stream equi-join with an event-time interval bound: a left
    row matches right rows with the same key whose timestamp lies in
    [left_ts - within, left_ts + within].

    Both sides are watermarked and the interval condition is what makes
    the join's state FINITE: each side buffers only rows the other side
    could still match (watermark + within), then drops them — without
    the time bound a stream-stream join would buffer both streams
    forever. This is the streaming form of the batch interval join
    (operators/rangejoin.py), with the same correctness and a state
    budget of O(rate x window) per key.
    """
    lw = left.withWatermark(left_ts, watermark_delay).alias("l")
    rw = right.withWatermark(right_ts, watermark_delay).alias("r")
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts - F.expr(f"INTERVAL {within}"))
        & (rts <= lts + F.expr(f"INTERVAL {within}"))
    )
    return lw.join(rw, on=cond, how="inner")


def run_windowed_counts_once(
    spark,
    source_dir: str,
    schema,
    ts_col: str,
    out_dir: str,
    checkpoint_dir: str,
    key_cols: Sequence[str] = (),
    window_duration: str = "1 hour",
    watermark_delay: str = "10 minutes",
) -> None:
    """One AvailableNow drain of the windowed aggregation into a parquet
    sink. Re-running after new files land continues from the checkpoint:
    the watermark persists across runs, so finalized windows emit in the
    run whose data pushes the watermark past their end — and never
    again."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = windowed_counts(
        stream,
        ts_col,
        key_cols=key_cols,
        window_duration=window_duration,
        watermark_delay=watermark_delay,
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
