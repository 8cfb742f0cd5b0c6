"""Bucketed-table co-located joins: two tables bucketed on the same key
with the same bucket count must join with zero exchanges (and, when
sorted by the key, zero per-task sorts). This is the storage-level scale
property write_bucketed exists for — lock it at plan level."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from oic_options_chains_spark.sources.warehouse import read_bucketed, write_bucketed


@pytest.fixture
def no_broadcast(spark):
    """Force the join to its shuffle-or-bucket path: with broadcast on,
    the plan proves nothing about bucketing."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # Spark 3+ ignores bucket sort metadata unless this is on (reading
    # several buckets per task would interleave them); with one file per
    # bucket — which write_bucketed guarantees — it is safe and removes
    # the per-task merge-join sort.
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")


def test_bucketed_join_has_no_exchange_or_sort(spark, tmp_path, no_broadcast):
    facts = spark.range(0, 10_000).select(
        (F.col("id") % 200).alias("symbol_key"), F.col("id").alias("qty")
    )
    dims = spark.range(0, 200).select(
        F.col("id").alias("symbol_key"), (F.col("id") * 2).alias("grp")
    )
    write_bucketed(
        facts, "t_facts_b", str(tmp_path / "facts"), ["symbol_key"], 8,
        sort_cols=["symbol_key"],
    )
    write_bucketed(
        dims, "t_dims_b", str(tmp_path / "dims"), ["symbol_key"], 8,
        sort_cols=["symbol_key"],
    )
    try:
        joined = read_bucketed(spark, "t_facts_b").join(
            read_bucketed(spark, "t_dims_b"), "symbol_key"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # matching sortBy means the merge join needs no per-task sort
        assert "Sort " not in plan, plan
        # and the result is still correct
        assert joined.count() == 10_000
    finally:
        spark.sql("DROP TABLE IF EXISTS t_facts_b")
        spark.sql("DROP TABLE IF EXISTS t_dims_b")


def test_unbucketed_same_join_shuffles(spark, tmp_path, no_broadcast):
    """Control: the identical join over plain parquet DOES exchange —
    proving the bucket metadata, not AQE luck, removes the shuffle."""
    facts = spark.range(0, 10_000).select(
        (F.col("id") % 200).alias("symbol_key"), F.col("id").alias("qty")
    )
    dims = spark.range(0, 200).select(
        F.col("id").alias("symbol_key"), (F.col("id") * 2).alias("grp")
    )
    facts.write.parquet(str(tmp_path / "pf"))
    dims.write.parquet(str(tmp_path / "pd"))
    joined = spark.read.parquet(str(tmp_path / "pf")).join(
        spark.read.parquet(str(tmp_path / "pd")), "symbol_key"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan


def test_date_partitioned_join_uses_dynamic_partition_pruning(
    spark, tmp_path, no_broadcast
):
    """The warehouse's dominant enrichment join (date-partitioned fact x
    filtered dim) must prune fact partitions at runtime via DPP — at
    100 TB this is the difference between scanning one day and a year."""
    from pyspark.sql import functions as F

    facts = spark.range(0, 5000).select(
        (F.date_add(F.lit("2024-01-01"), (F.col("id") % 30).cast("int")))
        .alias("date"),
        F.col("id").alias("qty"),
    )
    facts.write.partitionBy("date").parquet(str(tmp_path / "fact"))
    dims = spark.range(0, 30).select(
        F.date_add(F.lit("2024-01-01"), F.col("id").cast("int")).alias("date"),
        (F.col("id") % 3).alias("grp"),
    )
    dims.write.parquet(str(tmp_path / "dim"))

    f = spark.read.parquet(str(tmp_path / "fact"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter(F.col("grp") == 0)
    plan = (
        f.join(d, "date")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "dynamicpruning" in plan.lower(), plan
