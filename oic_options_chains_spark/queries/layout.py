"""Data-layout t2 queries: z-order clustering keys and pruning-stats
manifests (operators/layout.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.layout import (
    partition_stats,
    zorder_key_sql,
)
from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table

_Z_SQL = zorder_key_sql(["l_partkey", "l_suppkey"], bits=16)


@register(
    "q_zorder_layout",
    oracle=f"""
    WITH z AS (
      SELECT l_partkey, l_suppkey,
             CAST(({_Z_SQL}) AS BIGINT) >> 14 AS bucket
      FROM lineitem)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_partkey) AS min_l_partkey, MAX(l_partkey) AS max_l_partkey,
           MIN(l_suppkey) AS min_l_suppkey, MAX(l_suppkey) AS max_l_suppkey
    FROM z GROUP BY bucket
    """,
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order file assignment over (l_partkey, l_suppkey) plus the
    per-bucket min/max manifest it produces: interleaved-bit keys give
    every bucket a tight range on BOTH dimensions, so a range predicate
    on either column prunes to a narrow band of buckets — the
    OPTIMIZE-ZORDER property, verifiable in the output. Pure integer
    shift/mask codegen; one map-side-combined aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    z = li.selectExpr(
        "l_partkey", "l_suppkey", f"CAST(({_Z_SQL}) AS BIGINT) AS __zkey"
    )
    return partition_stats(
        z,
        F.shiftright(F.col("__zkey"), 14),
        ["l_partkey", "l_suppkey"],
    )


@register(
    "q_partition_stats",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_orderkey) AS min_o_orderkey, MAX(o_orderkey) AS max_o_orderkey,
           MIN(o_custkey) AS min_o_custkey, MAX(o_custkey) AS max_o_custkey
    FROM orders GROUP BY 1
    """,
)
def q_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-partition pruning manifest for orders: the min/max/count
    table a scan planner intersects with predicates to skip partitions
    (persisted next to data by sources/snapshots.py at deploy). One
    aggregate onto month keys — manifest cost is file-count-sized."""
    o = load_table(spark, sf_dir, "orders")
    return partition_stats(
        o,
        F.date_trunc("month", F.col("o_orderdate")).cast("date"),
        ["o_orderkey", "o_custkey"],
    )
