"""Optimization r15: the Arrow pair-distance kernel is bit-identical
to the interpreted fold it replaced.

``_cell_pair_distances`` routes the within-cell squared-L2 through
``kmeans._pair_l2_kernel`` (one numpy int64 batch op per Arrow batch)
instead of the ``zip_with``+``aggregate`` fold — the fold is a
CodegenFallback evaluated interpreted per element per pair and was the
measured superlinear CPU term of the semdedup pairing (sf0.5 A/B:
6.1 -> 4.0 s noop). Both tiers are exact integer arithmetic, so the
kernel may never move a value: this pins kernel == fold row-for-row on
real corpus pairs, the ``_assign_clusters_vectorized`` contract style.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.kmeans import (
    _pair_l2_kernel,
    kmeans_fit,
)
from oic_options_chains_spark.operators.skew import salted_join


def _pairs(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assigned, _ = kmeans_fit(e, k=8, iters=2)
    assigned = assigned.localCheckpoint(eager=True)
    a = assigned.select(
        "cid", F.col("vec_id").alias("vid_hi"), F.col("qarr").alias("q_hi")
    )
    b = assigned.select(
        "cid", F.col("vec_id").alias("vid_lo"), F.col("qarr").alias("q_lo")
    )
    return (
        salted_join(a, b, ["cid"], left_salt_from="vid_hi")
        .filter(F.col("vid_lo") < F.col("vid_hi"))
        .select("cid", "vid_hi", "vid_lo", "q_hi", "q_lo")
    )


def test_pair_kernel_matches_fold(spark, sf_dir):
    pairs = _pairs(spark, sf_dir).localCheckpoint(eager=True)
    fold_d = F.aggregate(
        F.zip_with("q_hi", "q_lo", lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    expected = pairs.select("cid", "vid_hi", "vid_lo", fold_d.alias("d"))
    actual = _pair_l2_kernel(pairs)
    assert actual.schema["d"].dataType.simpleString() == "bigint"
    # exact set equality both ways (exceptAll is order-insensitive)
    assert actual.exceptAll(expected).count() == 0
    assert expected.exceptAll(actual).count() == 0
    assert actual.count() == expected.count() > 0
