"""k-anonymity / l-diversity audit invariants (operators/privacy.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.privacy import (
    k_anonymity_cells,
    suppression_summary,
)

QI = ["c_nationkey", "c_mktsegment", "bal_bucket"]


def _cells(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
    q = c.select("c_nationkey", "c_mktsegment", cents.alias("cents")).withColumn(
        "bal_bucket", F.expr("(cents + 10000000) div 100000")
    )
    return q, k_anonymity_cells(q, QI, F.col("cents"), k=5, l=2)


def test_cells_partition_the_input(spark, sf_dir):
    q, cells = _cells(spark, sf_dir)
    total = q.count()
    agg = cells.agg(
        F.sum("n_rows").alias("n"), F.count(F.lit(1)).alias("n_cells")
    ).first()
    assert agg["n"] == total
    # every cell is non-empty and l_distinct never exceeds its size
    bad = cells.filter(
        (F.col("n_rows") < 1) | (F.col("l_distinct") > F.col("n_rows"))
    ).count()
    assert bad == 0


def test_flags_match_thresholds(spark, sf_dir):
    _, cells = _cells(spark, sf_dir)
    bad = cells.filter(
        (F.col("k_anonymous") != (F.col("n_rows") >= 5).cast("int"))
        | (F.col("l_diverse") != (F.col("l_distinct") >= 2).cast("int"))
    ).count()
    assert bad == 0


def test_summary_accounts_for_every_record(spark, sf_dir):
    q, cells = _cells(spark, sf_dir)
    s = suppression_summary(cells, QI).first()
    assert s["n_records"] == q.count()
    # releasable + below-k + (big-but-homogeneous) partitions the corpus
    homog = (
        cells.filter((F.col("k_anonymous") == 1) & (F.col("l_diverse") == 0))
        .agg(F.coalesce(F.sum("n_rows"), F.lit(0)).alias("n"))
        .first()["n"]
    )
    assert s["records_releasable"] + s["records_below_k"] + homog == s["n_records"]
    # the audit is meaningful on this data: some cells actually fail k
    assert s["cells_below_k"] > 0
