"""Properties of the densified OPH sketch (operators/minhash._wide_oph):
densification correctness, collision semantics vs the k-permutation
path, and the 1/k hashing-CPU claim checked on the actual plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.minhash import (
    doc_shingles,
    lsh_candidate_pairs,
    minhash_signatures,
    oph_band_keys,
    oph_signatures,
)


def _sketch(spark, texts, k=8):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    sh = doc_shingles(docs, "doc_id", "text", distinct=False)
    return {
        (r.doc_id, r.seed): r.minhash
        for r in oph_signatures(sh, "doc_id", num_bins=k).collect()
    }


def test_single_shingle_densifies_all_bins(spark):
    """A doc with exactly one shingle fills ONE bin; rotation
    densification must propagate that value into every bin."""
    got = _sketch(spark, ["alpha beta gamma"])  # 3 words -> 1 shingle
    assert len(got) == 8
    assert len(set(got.values())) == 1  # all bins borrow the same min


def test_identical_docs_identical_sketches(spark):
    got = _sketch(spark, ["the quick brown fox jumps", "the quick brown fox jumps"])
    for seed in range(8):
        assert got[(0, seed)] == got[(1, seed)]


def test_disjoint_docs_differ(spark):
    got = _sketch(
        spark,
        [
            "aa bb cc dd ee ff gg hh ii jj kk ll",
            "mm nn oo pp qq rr ss tt uu vv ww xx",
        ],
    )
    assert any(got[(0, s)] != got[(1, s)] for s in range(8))


def test_oph_pairs_find_exact_duplicates(spark):
    texts = [
        "one two three four five six seven eight nine ten",
        "one two three four five six seven eight nine ten",  # dup of 0
        "completely different words appear in this other document here now",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    sh = doc_shingles(docs, "doc_id", "text", distinct=False)
    pairs = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(oph_band_keys(sh, "doc_id"), "doc_id").collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_oph_plan_hashes_once_per_shingle(spark, sf_dir):
    """The reason OPH exists: the k-permutation aggregate evaluates k
    md5 calls per shingle row; OPH evaluates md5 for the value + bin
    only. Locked on the optimized plan so a refactor that quietly
    reintroduces per-seed hashing fails here."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = doc_shingles(docs, "doc_id", "text", distinct=False)
    kperm = minhash_signatures(sh, "doc_id", num_hashes=8)
    oph = oph_signatures(sh, "doc_id", num_bins=8)
    n_kperm = kperm._jdf.queryExecution().optimizedPlan().toString().count("md5")
    n_oph = oph._jdf.queryExecution().optimizedPlan().toString().count("md5")
    assert n_kperm >= 8
    assert n_oph <= 2


def test_bands_expr_matches_batch_path(spark, sf_dir):
    """The row-local expression sketch (oph_bands_expr, the streaming
    form) must produce byte-identical band keys to the aggregated batch
    path (oph_band_keys) on real corpus text."""
    from oic_options_chains_spark.operators.minhash import oph_bands_expr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = doc_shingles(docs, "doc_id", "text", distinct=False)
    batch = {
        (r.doc_id, r.band): r.band_key
        for r in oph_band_keys(sh, "doc_id").collect()
    }
    expr = {
        (r.doc_id, r.band): r.band_key
        for r in docs.select(
            "doc_id", F.explode(oph_bands_expr(F.col("text"))).alias("s")
        )
        .select("doc_id", F.col("s.band").alias("band"), F.col("s.band_key").alias("band_key"))
        .collect()
        if r.band_key is not None
    }
    # every doc with >= 3 words agrees exactly; batch path only has
    # rows for docs with shingles, so the key sets must match too
    assert batch == expr
    assert len(batch) > 0
