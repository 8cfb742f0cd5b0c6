"""DSIR importance-resampling selection: semantics, determinism, plan."""

import pytest
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.dsir import (
    dsir_bucket_ratios,
    dsir_scores,
    dsir_select,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = (
        # target slice: a distinctive vocabulary
        [(i, "alpha beta gamma alpha beta", True) for i in range(5)]
        # raw noise: disjoint vocabulary
        + [(10 + i, "zork quux blarg wibble", False) for i in range(5)]
        # candidates: one target-like, one noise-like
        + [(100, "alpha beta gamma", False), (101, "zork quux blarg", False)]
    )
    return spark.createDataFrame(rows, "doc_id long, text string, is_tgt boolean")


def test_target_like_doc_outranks_noise(corpus):
    top = dsir_select(corpus, F.col("is_tgt"), k=20).collect()
    rank = {r.doc_id: r.rank for r in top}
    assert rank[100] < rank[101]
    score = {r.doc_id: r.dsir_score for r in top}
    assert score[100] > score[101]


def test_ratio_table_is_model_sized_and_consistent(corpus):
    ratios = dsir_bucket_ratios(corpus, F.col("is_tgt"), n_buckets=64)
    rows = ratios.collect()
    assert len(rows) <= 64
    # target counts are a subset of raw counts, bucket by bucket
    assert all(0 <= r.c_tgt <= r.c_raw for r in rows)
    # a bucket only the target slice populates must out-ratio a bucket
    # only the noise populates
    tgt_only = [r.ratio_sc for r in rows if r.c_tgt == r.c_raw and r.c_raw > 0]
    noise_only = [r.ratio_sc for r in rows if r.c_tgt == 0 and r.c_raw > 0]
    assert tgt_only and noise_only
    assert min(tgt_only) > max(noise_only)


def test_scores_partition_invariant(corpus):
    """Integer-exact claim: scores cannot drift with input partitioning
    (order-independent integer sums + integer division only)."""
    s1 = dsir_scores(corpus.repartition(1), F.col("is_tgt"))
    s7 = dsir_scores(corpus.repartition(7, "text"), F.col("is_tgt"))
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s7.collect()))


def test_separate_target_corpus_unions_in(spark, corpus):
    """The paper's external-target setup: a separate target corpus
    unions in flagged true; scoring of the raw docs is identical to the
    predicate-column form because the model sees the same counts."""
    raw = corpus.filter(~F.col("is_tgt")).select("doc_id", "text")
    tgt = corpus.filter(F.col("is_tgt")).select("doc_id", "text")
    unioned = raw.withColumn("is_tgt", F.lit(False)).unionByName(
        tgt.withColumn("is_tgt", F.lit(True))
    )
    via_union = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(unioned, F.col("is_tgt")).collect()
    }
    via_pred = {
        r.doc_id: r.dsir_score
        for r in dsir_scores(corpus, F.col("is_tgt")).collect()
    }
    assert via_union == via_pred


def test_select_plan_shape(corpus):
    plan = (
        dsir_select(corpus, F.col("is_tgt"), k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan  # stays JVM-side end to end


@pytest.fixture(scope="module")
def langs(spark):
    rows = [(i, "en", 100) for i in range(80)] + [
        (100 + i, "mi", 100) for i in range(5)
    ] + [(200 + i, "fr", 100) for i in range(15)]
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


def test_temperature_flattens_toward_low_resource(langs):
    from oic_options_chains_spark.operators.sampling import temperature_weights

    w = {
        r.lang: r
        for r in temperature_weights(
            langs, "lang", alpha_quarters=2, size_col="n_chars"
        ).collect()
    }
    # low-resource slice gains share, head slice loses share
    assert w["mi"].weight_bp > w["mi"].nat_bp
    assert w["en"].weight_bp < w["en"].nat_bp
    # shares are basis points summing to ~10000 (floor slack < n_groups)
    tot = sum(r.weight_bp for r in w.values())
    assert 10000 - len(w) < tot <= 10000


def test_temperature_alpha_monotone(langs):
    """Lower alpha flattens harder: the low-resource share is monotone
    decreasing in alpha (0.25 > 0.5 > 0.75)."""
    from oic_options_chains_spark.operators.sampling import temperature_weights

    shares = [
        {
            r.lang: r.weight_bp
            for r in temperature_weights(
                langs, "lang", alpha_quarters=q, size_col="n_chars"
            ).collect()
        }
        for q in (1, 2, 3)
    ]
    assert shares[0]["mi"] > shares[1]["mi"] > shares[2]["mi"]
    assert shares[0]["en"] < shares[1]["en"] < shares[2]["en"]


def test_temperature_partition_invariant(langs):
    from oic_options_chains_spark.operators.sampling import temperature_weights

    a = temperature_weights(langs.repartition(1), "lang", 2, "n_chars")
    b = temperature_weights(langs.repartition(7, "doc_id"), "lang", 2, "n_chars")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
