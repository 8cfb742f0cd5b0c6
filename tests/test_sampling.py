"""Deterministic sampling operators: reproducibility and stability
properties (the reasons seeded df.sample() is banned from this surface)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.sampling import (
    hash_bucket,
    sample_fraction,
    sample_per_group,
    split_assign,
)


def test_bucket_range_and_determinism(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    b = df.select(hash_bucket(F.col("doc_id")).alias("b"))
    lo, hi = b.agg(F.min("b"), F.max("b")).first()
    assert 0 <= lo and hi <= 99
    # two independent evaluations agree row-for-row
    one = dict(df.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect())
    two = dict(df.select("doc_id", hash_bucket(F.col("doc_id")).alias("b")).collect())
    assert one == two


def test_split_membership_is_stable_under_corpus_growth(spark):
    # the held-out property: a doc's split never changes when the corpus
    # around it grows — membership is a pure function of the key
    small = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    big = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    s_small = dict(
        small.select("doc_id", split_assign(F.col("doc_id")).alias("s")).collect()
    )
    s_big = dict(
        big.select("doc_id", split_assign(F.col("doc_id")).alias("s")).collect()
    )
    assert all(s_big[k] == v for k, v in s_small.items())


def test_split_weights_roughly_hold(spark):
    df = spark.range(0, 20000).select(F.col("id").alias("doc_id"))
    counts = dict(
        df.select(split_assign(F.col("doc_id")).alias("s"))
        .groupBy("s")
        .count()
        .collect()
    )
    n = sum(counts.values())
    assert 0.85 < counts["train"] / n < 0.95
    assert 0.02 < counts["val"] / n < 0.08
    assert 0.02 < counts["test"] / n < 0.08


def test_bad_weights_rejected():
    with pytest.raises(AssertionError, match="sum to 100"):
        split_assign(F.lit(1), weights=(("train", 50), ("val", 10)))


def test_sample_fraction_subset_of_source(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    s = sample_fraction(df, "doc_id", 10)
    n = s.count()
    assert 0 < n < 1000
    assert s.join(df, on="doc_id", how="left_anti").count() == 0


def test_sample_per_group_k_and_determinism(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("grp")
    )
    s1 = sorted(map(tuple, sample_per_group(df, ["grp"], "doc_id", 5).collect()))
    s2 = sorted(map(tuple, sample_per_group(df, ["grp"], "doc_id", 5).collect()))
    assert s1 == s2
    per_group = (
        sample_per_group(df, ["grp"], "doc_id", 5).groupBy("grp").count().collect()
    )
    assert all(r["count"] == 5 for r in per_group)


def test_token_budget_prefix_admission(spark):
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.sampling import token_budget_sample

    df = spark.createDataFrame(
        [(i, "a", 10) for i in range(10)] + [(100 + i, "b", 10) for i in range(10)],
        "doc_id bigint, source string, toks bigint",
    )
    budgets = spark.createDataFrame(
        [("a", 35), ("b", 1000)], "source string, budget_tokens bigint"
    )
    out = token_budget_sample(df, "source", "toks", "doc_id", budgets)
    per = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    # source a: budget 35 admits exactly 3 docs of 10 tokens (prefix rule);
    # source b: budget covers everything
    assert per == {"a": 3, "b": 10}
    # admitted set is the hash-order PREFIX: re-running on a superset keeps
    # every admitted doc whose hash rank is unchanged
    tot = {r["source"]: r["t"] for r in out.groupBy("source").agg(
        F.sum("toks").alias("t")).collect()}
    assert tot["a"] == 30 and tot["b"] == 100
