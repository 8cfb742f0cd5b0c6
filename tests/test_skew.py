"""Salted-join correctness: salting must never change results."""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.skew import salted_join


def test_salted_join_matches_plain_join(spark):
    # 90% of fact rows hit one hot key
    left = spark.range(2000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit("HOT"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .alias("key"),
        (F.col("id") * 2).alias("payload"),
    )
    right = spark.createDataFrame(
        [("HOT", 1), ("k0", 2), ("k3", 3), ("unmatched", 9)], "key string, dim int"
    )

    plain = left.join(right, on=["key"], how="inner")
    salted = salted_join(left, right, on=["key"], left_salt_from="row_id")

    assert salted.columns == plain.columns
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b and len(a) > 0
