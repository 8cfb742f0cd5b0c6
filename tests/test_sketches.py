"""KMV distinct sketch: exactness below saturation, sane error above,
and mergeability (the property that makes it partition-parallel)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.sketches import (
    kmv_distinct_estimate,
    kmv_minima,
)


def test_exact_below_saturation(spark):
    df = spark.range(0, 40).select(F.col("id").cast("string").alias("v"))
    row = kmv_distinct_estimate(df, "v", k=64).first()
    assert row.n_minima == 40 and row.estimate == 40


def test_estimate_error_bounded_at_saturation(spark):
    true_n = 5000
    df = spark.range(0, true_n).select(F.col("id").cast("string").alias("v"))
    est = kmv_distinct_estimate(df, "v", k=256).first().estimate
    # KMV relative std error ~ 1/sqrt(k-2) ~ 6.3% at k=256; allow 4 sigma
    assert abs(est - true_n) / true_n < 0.25, est


def test_duplicates_do_not_move_the_estimate(spark):
    base = spark.range(0, 1000).select(F.col("id").cast("string").alias("v"))
    dup = base.unionAll(base).unionAll(base)
    e1 = kmv_distinct_estimate(base, "v", k=128).first().estimate
    e3 = kmv_distinct_estimate(dup, "v", k=128).first().estimate
    assert e1 == e3


def test_merge_equals_global_sketch(spark):
    # sketch(par A) union sketch(par B), re-limited, equals sketch(A∪B):
    # the mergeability that lets 100 TB sketch per-partition then combine
    k = 64
    a = spark.range(0, 3000).select(F.col("id").cast("string").alias("v"))
    b = spark.range(2000, 6000).select(F.col("id").cast("string").alias("v"))
    merged = (
        kmv_minima(a, "v", k)
        .unionAll(kmv_minima(b, "v", k))
        .distinct()  # overlap region hashes identically in both sketches
        .orderBy("f")
        .limit(k)
    )
    direct = kmv_minima(a.unionAll(b), "v", k)
    assert [r.f for r in merged.collect()] == [r.f for r in direct.collect()]
