"""Streaming HLL maintenance: the running-distinct register table must
equal the batch sketch over everything streamed so far, and re-merging
(at-least-once replay) must be a bit-identical no-op."""

from __future__ import annotations

import os

from oic_options_chains_spark.operators.sketches import hll_distinct_estimate
from oic_options_chains_spark.streaming.sketch_stream import (
    merge_into_register_table,
    read_running_estimate,
    run_incremental_distinct,
)

SCHEMA = "user_id bigint"


def _add_file(spark, src, name, ids):
    spark.createDataFrame([(i,) for i in ids], SCHEMA).coalesce(1).write.parquet(
        os.path.join(src, name)
    )


def _stream(spark, src):
    return spark.readStream.schema(SCHEMA).parquet(src + "/*")


def test_streamed_registers_match_batch_sketch(spark, tmp_path):
    src = str(tmp_path / "src")
    regs = str(tmp_path / "regs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    _add_file(spark, src, "b1", range(0, 400))
    _add_file(spark, src, "b2", range(300, 700))  # overlaps b1
    run_incremental_distinct(spark, _stream(spark, src), "user_id", regs, ckpt)

    streamed = read_running_estimate(spark, regs).collect()[0]
    all_ids = spark.createDataFrame([(i,) for i in range(0, 700)], SCHEMA)
    direct = hll_distinct_estimate(all_ids, "user_id").collect()[0]
    assert streamed["estimate"] == direct["estimate"]
    assert streamed["sum_scaled"] == direct["sum_scaled"]

    # Late file: a second AvailableNow drain picks it up and the running
    # sketch advances to the new batch truth.
    _add_file(spark, src, "b3", range(650, 900))
    run_incremental_distinct(spark, _stream(spark, src), "user_id", regs, ckpt)
    streamed2 = read_running_estimate(spark, regs).collect()[0]
    all2 = spark.createDataFrame([(i,) for i in range(0, 900)], SCHEMA)
    direct2 = hll_distinct_estimate(all2, "user_id").collect()[0]
    assert streamed2["estimate"] == direct2["estimate"]


def test_replayed_merge_is_bit_identical(spark, tmp_path):
    regs = str(tmp_path / "regs")
    batch = spark.createDataFrame([(i,) for i in range(500)], SCHEMA)
    merge_into_register_table(spark, batch, "user_id", regs)
    before = sorted((r["reg"], r["rho"]) for r in spark.read.parquet(regs).collect())
    # at-least-once retry: the same batch merges again
    merge_into_register_table(spark, batch, "user_id", regs)
    after = sorted((r["reg"], r["rho"]) for r in spark.read.parquet(regs).collect())
    assert before == after


def test_register_table_stays_bounded(spark, tmp_path):
    regs = str(tmp_path / "regs")
    batch = spark.createDataFrame([(i,) for i in range(20_000)], SCHEMA)
    merge_into_register_table(spark, batch, "user_id", regs)
    assert spark.read.parquet(regs).count() <= 256
