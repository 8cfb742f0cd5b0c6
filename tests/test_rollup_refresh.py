"""Incremental rollup refresh: merge(agg(A), agg(B)) == agg(A ∪ B) for
any split, chained refreshes compose, and late data lands correctly."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.rollup import (
    merge_rollup,
    refresh_rollup,
    rollup_delta,
)
from oic_options_chains_spark.sources.registry import load_table


def _canon(df):
    return sorted(
        (r.bucket_start, r.event_type, r.n_events, str(r.total_value))
        for r in df.collect()
    )


def test_any_split_matches_full_recompute(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    full = rollup_delta(e)
    for split in ("2024-01-10", "2024-02-01", "2024-03-01"):
        ts = F.lit(f"{split} 00:00:00").cast("timestamp")
        merged = refresh_rollup(
            rollup_delta(e.filter(F.col("ts") < ts)), e.filter(F.col("ts") >= ts)
        )
        assert _canon(merged) == _canon(full), split


def test_chained_refreshes_compose(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    t1 = F.lit("2024-01-20 00:00:00").cast("timestamp")
    t2 = F.lit("2024-02-10 00:00:00").cast("timestamp")
    state = rollup_delta(e.filter(F.col("ts") < t1))
    state = refresh_rollup(state, e.filter((F.col("ts") >= t1) & (F.col("ts") < t2)))
    state = refresh_rollup(state, e.filter(F.col("ts") >= t2))
    assert _canon(state) == _canon(rollup_delta(e))


def test_late_data_merges_into_old_bucket(spark):
    early = spark.createDataFrame(
        [(1, "click", 10.0, dt.datetime(2024, 1, 1, 10, 5))],
        "event_id long, event_type string, value double, ts timestamp",
    )
    late = spark.createDataFrame(
        [(2, "click", 5.0, dt.datetime(2024, 1, 1, 10, 55))],
        "event_id long, event_type string, value double, ts timestamp",
    )
    state = refresh_rollup(rollup_delta(early), late)
    rows = state.collect()
    assert len(rows) == 1  # same hour bucket — merged, not appended
    assert rows[0].n_events == 2 and str(rows[0].total_value) == "15.00"


def test_merge_is_commutative(spark, sf_dir):
    e = load_table(spark, sf_dir, "events")
    ts = F.lit("2024-02-01 00:00:00").cast("timestamp")
    a = rollup_delta(e.filter(F.col("ts") < ts))
    b = rollup_delta(e.filter(F.col("ts") >= ts))
    assert _canon(merge_rollup(a, b)) == _canon(merge_rollup(b, a))
