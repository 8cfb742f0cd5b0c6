"""Watermarked streaming window semantics across restarts: a window is
emitted exactly once when the watermark passes its end, and rows later
than the watermark are dropped before aggregation (emitted results are
immutable)."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql.types import StringType, StructField, StructType, TimestampType

from oic_options_chains_spark.streaming.windows import run_windowed_counts_once

SCHEMA = StructType(
    [
        StructField("ts", TimestampType(), False),
        StructField("kind", StringType(), False),
    ]
)


def _t(h, m=0):
    return dt.datetime(2024, 3, 1, h, m)


def _add_file(spark, src, name, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
        os.path.join(src, name)
    )


def _emitted(spark, out):
    try:
        return {
            (r.window_start, r.kind): r.n
            for r in spark.read.parquet(out).collect()
        }
    except Exception:
        return {}


def test_session_windows_merge_and_close_behind_watermark(spark, tmp_path):
    from oic_options_chains_spark.streaming.windows import sessionized_counts

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def run():
        stream = spark.readStream.schema(SCHEMA).parquet(src + "/*")
        q = (
            sessionized_counts(
                stream, "ts", key_cols=["kind"],
                gap="30 minutes", watermark_delay="10 minutes",
            )
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def emitted():
        try:
            return {
                (r.session_start, r.kind): (r.session_end, r.n)
                for r in spark.read.parquet(out).collect()
            }
        except Exception:
            return {}

    # 10:00 and 10:10 merge into one session (gap 30m); 12:00 starts a
    # second session AND pushes the watermark to 11:50, which closes the
    # first (its end 10:40 < 11:50) during the AvailableNow flush.
    _add_file(
        spark, src, "s1",
        [(_t(10, 0), "a"), (_t(10, 10), "a"), (_t(12, 0), "a")],
    )
    run()
    got = emitted()
    assert got == {(_t(10, 0), "a"): (_t(10, 40), 2)}

    # 12:20 extends the open 12:00 session (within gap); 15:00 pushes
    # the watermark past its extended end, so it emits merged: 12:00 ->
    # 12:50, two rows. The closed first session must not re-emit.
    _add_file(spark, src, "s2", [(_t(12, 20), "a"), (_t(15, 0), "a")])
    run()
    got = emitted()
    assert got[(_t(10, 0), "a")] == (_t(10, 40), 2)
    assert got[(_t(12, 0), "a")] == (_t(12, 50), 2)


def test_window_emits_once_and_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def run():
        run_windowed_counts_once(
            spark, src + "/*", SCHEMA, "ts", out, ckpt, key_cols=["kind"],
            window_duration="1 hour", watermark_delay="10 minutes",
        )

    # Run 1: two rows in the 10:00 window plus a 12:00 row that pushes
    # the watermark to 11:50. AvailableNow runs a final flush batch after
    # the watermark commit, so the 10:00 window (end 11:00 <= 11:50)
    # emits within this run already.
    _add_file(
        spark, src, "b1",
        [(_t(10, 0), "a"), (_t(10, 30), "a"), (_t(12, 0), "b")],
    )
    run()
    assert _emitted(spark, out) == {(_t(10, 0), "a"): 2}

    # Run 2: a 13:00 row (keeps the stream moving) and a LATE 10:45 row —
    # older than the persisted 11:50 watermark, so it must neither
    # re-open nor re-emit the finalized 10:00 window: emitted results
    # are immutable.
    _add_file(spark, src, "b2", [(_t(13, 0), "b"), (_t(10, 45), "a")])
    run()
    got = _emitted(spark, out)
    assert got == {(_t(10, 0), "a"): 2}

    # Run 3: advance far enough to close everything else; the 10:00
    # window must not re-emit or change.
    _add_file(spark, src, "b3", [(_t(20, 0), "b")])
    run()
    got = _emitted(spark, out)
    assert got[(_t(10, 0), "a")] == 2
    assert got[(_t(12, 0), "b")] == 1
    assert got[(_t(13, 0), "b")] == 1


def test_stream_stream_interval_join_matches_within_bound(spark, tmp_path):
    from oic_options_chains_spark.streaming.windows import interval_join_streams

    srca = str(tmp_path / "a")
    srcb = str(tmp_path / "b")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(srca)
    os.makedirs(srcb)

    # left: orders; right: fills — match within 15 minutes per kind
    _add_file(
        spark, srca, "a1",
        [(_t(10, 0), "x"), (_t(11, 0), "x"), (_t(10, 0), "y")],
    )
    _add_file(
        spark, srcb, "b1",
        [(_t(10, 10), "x"),   # matches 10:00 x (10 min)
         (_t(11, 40), "x"),   # matches nothing (40 min from 11:00)
         (_t(10, 14), "y")],  # matches 10:00 y (14 min)
    )

    left = spark.readStream.schema(SCHEMA).parquet(srca + "/*")
    right = (
        spark.readStream.schema(SCHEMA).parquet(srcb + "/*")
        .withColumnRenamed("ts", "fill_ts")
    )
    from pyspark.sql import functions as F

    joined = interval_join_streams(
        left, right, key="kind", left_ts="ts", right_ts="fill_ts",
        within="15 minutes",
    ).select(F.col("l.kind").alias("kind"), F.col("l.ts").alias("ts"), "fill_ts")
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {(r.kind, r.ts, r.fill_ts) for r in spark.read.parquet(out).collect()}
    assert got == {
        ("x", _t(10, 0), _t(10, 10)),
        ("y", _t(10, 0), _t(10, 14)),
    }
