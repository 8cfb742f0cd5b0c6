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


def test_hll_shard_merge_equals_direct(spark, sf_dir):
    from oic_options_chains_spark.operators.sketches import (
        hll_distinct_estimate,
        hll_estimate_from_registers,
        hll_group_registers,
        hll_merge_registers,
    )
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "events")
    direct = hll_distinct_estimate(e, "user_id", b=8).collect()[0]
    merged_regs = hll_merge_registers(
        hll_group_registers(e, "user_id", "event_type", b=8)
    )
    merged = hll_estimate_from_registers(merged_regs, b=8).collect()[0]
    # union-merge of shard sketches is EXACT: identical registers,
    # identical estimate — not merely close
    assert merged["estimate"] == direct["estimate"]
    assert merged["sum_scaled"] == direct["sum_scaled"]


def test_hll_merge_associativity(spark):
    from oic_options_chains_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_group_registers,
        hll_merge_registers,
    )

    df = spark.createDataFrame(
        [(i, f"g{i % 5}") for i in range(2000)], "v bigint, grp string"
    )
    regs = hll_group_registers(df, "v", "grp", b=8)
    # merge all 5 at once vs merge {g0,g1} first then the rest: same sketch
    all_at_once = hll_merge_registers(regs)
    first = hll_merge_registers(regs.filter("grp IN ('g0','g1')"))
    rest = hll_merge_registers(regs.filter("grp NOT IN ('g0','g1')"))
    staged = hll_merge_registers(
        first.selectExpr("'a' AS grp", "reg", "rho").unionByName(
            rest.selectExpr("'b' AS grp", "reg", "rho")
        )
    )
    a = hll_estimate_from_registers(all_at_once, b=8).collect()[0]
    b = hll_estimate_from_registers(staged, b=8).collect()[0]
    assert a == b


def test_kmv_shard_merge_equals_direct(spark):
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_estimate_from_minima,
        kmv_group_minima,
        kmv_merge_minima,
    )

    # values deliberately shared across groups: the merge's distinct
    # must stop a cross-shard value from double-counting as two minima
    df = spark.createDataFrame(
        [(i % 300, f"g{i % 4}") for i in range(3000)], "v bigint, grp string"
    )
    direct = kmv_distinct_estimate(
        df.select(F.col("v").cast("string").alias("v")), "v", k=64
    ).collect()[0]
    merged = kmv_estimate_from_minima(
        kmv_merge_minima(kmv_group_minima(df, "v", "grp", k=64), k=64), k=64
    ).collect()[0]
    assert merged["estimate"] == direct["estimate"]
    assert merged["n_minima"] == direct["n_minima"]


def test_rolling_window_merge_equals_direct_build(spark, sf_dir):
    """Lattice exactness: MAX-merging daily registers over a 7-day window
    must give the IDENTICAL register set (hence identical estimate) as
    building one sketch directly from the window's raw rows."""
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.sketches import (
        hll_group_estimate,
        hll_group_registers,
    )
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "events").select(
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias(
            "day"
        ),
        "user_id",
    )
    target = 10  # window [4, 10]
    daily = hll_group_registers(e, "user_id", "day", b=8)
    merged = (
        daily.filter((F.col("grp") >= target - 6) & (F.col("grp") <= target))
        .groupBy("reg")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit(target).alias("grp"), "reg", "rho")
    )
    direct = hll_group_registers(
        e.filter((F.col("day") >= target - 6) & (F.col("day") <= target)).select(
            F.lit(target).alias("day"), "user_id"
        ),
        "user_id",
        "day",
        b=8,
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    em = hll_group_estimate(merged, b=8).collect()[0]
    ed = hll_group_estimate(direct, b=8).collect()[0]
    assert (em.estimate, em.n_zero_regs) == (ed.estimate, ed.n_zero_regs)
