"""Calendar densification invariants (operators/trend.gap_fill_ffill)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.trend import gap_fill_ffill


def _daily(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    return li.select(
        "l_returnflag",
        F.col("l_shipdate").cast("date").alias("day"),
        cents.alias("rev"),
    )


def test_axis_is_gapless_and_never_null(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    out = gap_fill_ffill(daily, "l_returnflag", "day", "rev")
    per_g = out.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        (F.datediff(F.max("day"), F.min("day")) + 1).alias("span"),
        F.count_distinct("day").alias("n_days"),
        F.sum(F.col("rev").isNull().cast("int")).alias("n_null"),
    )
    bad = per_g.filter(
        (F.col("n") != F.col("span"))
        | (F.col("n_days") != F.col("n"))
        | (F.col("n_null") != 0)
    ).count()
    assert bad == 0


def test_observed_rows_carry_the_observation(spark, sf_dir):
    daily = _daily(spark, sf_dir)
    obs = daily.groupBy("l_returnflag", "day").agg(
        F.sum("rev").cast("bigint").alias("want")
    )
    out = gap_fill_ffill(daily, "l_returnflag", "day", "rev")
    joined = out.filter(F.col("is_observed") == 1).join(
        obs, ["l_returnflag", "day"]
    )
    assert joined.filter(F.col("rev") != F.col("want")).count() == 0
    assert joined.count() == obs.count()
