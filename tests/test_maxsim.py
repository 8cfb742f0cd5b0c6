"""MaxSim late-interaction properties (operators/similarity.maxsim_topk)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.similarity import (
    dot,
    maxsim_topk,
    token_vectors,
)


def _queries(e):
    return e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_maxsim_dominates_full_dot(spark, sf_dir):
    """Σ_q max_d ⟨q_i, d_j⟩ ≥ Σ_i ⟨q_i, d_i⟩ = full-vector dot: the max
    over doc tokens is at least the aligned token's dot, so every
    retrieved score must be ≥ the plain dot score (modulo the ±1-per-
    sub-vector floor quantization slack)."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = maxsim_topk(e, _queries(e), k=1000000, n_sub=4)
    full = (
        e.crossJoin(F.broadcast(_queries(e)))
        .select(
            "query_id",
            "vec_id",
            F.floor(F.lit(1e6) * dot(F.col("embedding"), F.col("query_vec")))
            .cast("bigint")
            .alias("dot_e6"),
        )
    )
    bad = (
        got.join(full, ["query_id", "vec_id"])
        .filter(F.col("score_e6") < F.col("dot_e6") - 4)
        .count()
    )
    assert bad == 0


def test_single_subvector_reduces_to_dot_ranking(spark, sf_dir):
    """With n_sub=1 there is one token per side, so MaxSim IS the dot
    product: ranks must equal a floor-quantized dot top-k."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["score_e6"])
        for r in maxsim_topk(e, _queries(e), k=5, n_sub=1).collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("dot_e6").desc(), F.col("vec_id").asc()
    )
    want = {
        (r["query_id"], r["rank"]): (r["vec_id"], r["dot_e6"])
        for r in (
            e.crossJoin(F.broadcast(_queries(e)))
            .select(
                "query_id",
                "vec_id",
                F.floor(F.lit(1e6) * dot(F.col("embedding"), F.col("query_vec")))
                .cast("bigint")
                .alias("dot_e6"),
            )
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .collect()
        )
    }
    assert got == want


def test_token_vectors_partition_the_embedding(spark, sf_dir):
    """Concatenating the n_sub slices in tpos order rebuilds the vector
    exactly — no element is dropped or duplicated by the carve."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    tv = token_vectors(e.select("vec_id", "embedding"), n_sub=4)
    rebuilt = (
        tv.groupBy("vec_id")
        .agg(F.flatten(F.array_sort(F.collect_list(F.struct("tpos", "tvec")))
                       .getField("tvec")).alias("rebuilt"))
    )
    bad = (
        e.join(rebuilt, "vec_id")
        .filter(F.col("embedding") != F.col("rebuilt"))
        .count()
    )
    assert bad == 0
