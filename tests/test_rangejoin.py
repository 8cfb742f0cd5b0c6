"""Interval join: both strategies must produce identical results (the
bucketed decomposition is an optimization, never a semantics change),
including the boundary cases bucketing gets wrong when mis-derived."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.rangejoin import interval_join


def _points(spark):
    days = [
        dt.date(2024, 1, 1),   # exact interval start
        dt.date(2024, 1, 31),  # month boundary inside interval
        dt.date(2024, 2, 1),   # bucket edge
        dt.date(2024, 3, 15),  # exact interval end
        dt.date(2024, 3, 16),  # one past the end — must drop
        dt.date(2023, 12, 31), # one before the start — must drop
    ]
    return spark.createDataFrame([(d,) for d in days], "p date")


def _intervals(spark):
    return spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1), dt.date(2024, 3, 15)),
            (2, dt.date(2024, 2, 1), dt.date(2024, 2, 1)),  # single-day span
            (3, dt.date(2025, 1, 1), dt.date(2025, 6, 30)),  # disjoint
        ],
        "iv int, s date, e date",
    )


def test_strategies_agree_and_bounds_are_inclusive(spark):
    pts, ivs = _points(spark), _intervals(spark)
    got_b = sorted(
        map(tuple, interval_join(pts, "p", ivs, "s", "e", "bucket").collect())
    )
    got_n = sorted(
        map(tuple, interval_join(pts, "p", ivs, "s", "e", "broadcast").collect())
    )
    assert got_b == got_n
    matches = {(r[0], r[1]) for r in got_b}
    assert matches == {
        (dt.date(2024, 1, 1), 1),
        (dt.date(2024, 1, 31), 1),
        (dt.date(2024, 2, 1), 1),
        (dt.date(2024, 3, 15), 1),
        (dt.date(2024, 2, 1), 2),
    }


def test_bucket_join_is_equi_not_nested_loop(spark):
    pts, ivs = _points(spark), _intervals(spark)
    plan = (
        interval_join(pts, "p", ivs, "s", "e", "bucket")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_day_granularity(spark):
    pts = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 5).date(),), (dt.date(2024, 1, 3),)], "p date"
    )
    ivs = spark.createDataFrame(
        [(1, dt.date(2024, 1, 1), dt.date(2024, 1, 2))], "iv int, s date, e date"
    )
    got = interval_join(pts, "p", ivs, "s", "e", "bucket", granularity="day")
    assert [r.p for r in got.collect()] == [dt.date(2024, 1, 1)]


def test_malformed_and_null_intervals_drop_identically(spark):
    pts = spark.createDataFrame([(dt.date(2024, 1, 15),)], "p date")
    ivs = spark.createDataFrame(
        [
            (1, dt.date(2024, 1, 1), dt.date(2024, 1, 31)),   # valid: matches
            (2, dt.date(2024, 3, 1), dt.date(2024, 1, 1)),    # start > end
            (3, None, dt.date(2024, 12, 31)),                 # NULL start
            (4, dt.date(2024, 1, 1), None),                   # NULL end
        ],
        "iv int, s date, e date",
    )
    # bucket must not raise on the inverted interval (F.sequence with a
    # positive step errors when start > stop) and both strategies agree
    got_b = sorted(map(tuple, interval_join(pts, "p", ivs, "s", "e", "bucket").collect()))
    got_n = sorted(map(tuple, interval_join(pts, "p", ivs, "s", "e", "broadcast").collect()))
    assert got_b == got_n
    assert [r[1] for r in got_b] == [1]
