"""Unit tests for the round-3 curation operators: deterministic HLL,
hard-negative mining, quality-aware cluster keepers, MinHash agreement,
vocabulary/OOV, and the dataset manifest (oracle parity for the
registered queries lives in test_oracle_parity.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.sketches import (
    hll_distinct_estimate,
    hll_linear_table,
)


def test_hll_tracks_exact_within_expected_error(spark):
    # standard error for b=8 is ~6.5%; allow 3 sigma at each cardinality
    for n in (10, 500, 5000, 50000):
        df = spark.range(0, n).select(F.col("id").alias("k"))
        row = hll_distinct_estimate(df, "k", b=8).collect()[0]
        assert abs(row.estimate - n) <= max(3, 0.2 * n), (n, row.estimate)


def test_hll_empty_and_singleton(spark):
    empty = spark.range(0, 0).select(F.col("id").alias("k"))
    assert hll_distinct_estimate(empty, "k").collect()[0].estimate == 0
    one = spark.range(7, 8).select(F.col("id").alias("k"))
    assert hll_distinct_estimate(one, "k").collect()[0].estimate == 1


def test_hll_duplicate_insensitive_and_partition_invariant(spark):
    base = spark.range(0, 1000).select(F.col("id").alias("k"))
    dup = base.union(base).union(base)
    a = hll_distinct_estimate(base, "k").collect()[0]
    b = hll_distinct_estimate(dup.repartition(13), "k").collect()[0]
    assert tuple(a) == tuple(b)


def test_hll_linear_table_monotone(spark):
    t = hll_linear_table(256)
    assert len(t) == 256
    assert t[-1] == 0  # V = m -> ln(1) -> 0 (empty input maps here)
    assert all(t[i] >= t[i + 1] for i in range(255))  # fewer zeros -> more seen


def test_hard_negatives_contract(spark, sf_dir):
    from oic_options_chains_spark.operators.similarity import (
        hard_negatives,
        sign_bucket,
    )
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    out = hard_negatives(e, k=4, max_score_e6=950_000, bits=4)
    rows = out.collect()
    assert rows, "expected some negatives at test scale"
    # never self, never above the duplicate ceiling, slots in 1..4
    assert all(r.vec_id != r.neg_id for r in rows)
    assert all(r.score_e6 < 950_000 for r in rows)
    assert all(1 <= r.slot <= 4 for r in rows)
    # slots are dense and scores non-increasing within an anchor
    by_anchor: dict[int, list] = {}
    for r in rows:
        by_anchor.setdefault(r.vec_id, []).append(r)
    for anchor, rs in by_anchor.items():
        rs.sort(key=lambda r: r.slot)
        assert [r.slot for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.score_e6 for r in rs]
        assert scores == sorted(scores, reverse=True)
    # negatives come from the anchor's own sign bucket
    b = e.select(
        F.col("vec_id"), sign_bucket(F.col("embedding"), 4).alias("b")
    ).collect()
    bucket = {r.vec_id: r.b for r in b}
    assert all(bucket[r.vec_id] == bucket[r.neg_id] for r in rows)


def test_keeper_by_quality_keeps_best_not_smallest(spark):
    from oic_options_chains_spark.operators.clusters import keeper_by_quality

    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 50), (9, 1)],
        "doc_id long, q long",
    )
    # cluster {1,2,3}: best quality 99 shared by 2 and 3 -> min id 2 wins
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    out = {r.doc_id: r for r in keeper_by_quality(docs, pairs, "q").collect()}
    assert out[1].keeper_id == 2 and out[1].is_keeper == 0
    assert out[2].is_keeper == 1
    assert out[3].keeper_id == 2 and out[3].is_keeper == 0
    # singletons keep themselves
    assert out[4].is_keeper == 1 and out[4].cluster_id == 4
    assert out[9].is_keeper == 1


def test_signature_agreement_bounds_and_identity(spark):
    from oic_options_chains_spark.operators.minhash import (
        doc_shingles,
        signature_agreement,
    )

    text = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, "an entirely different set of words here")],
        "doc_id long, text string",
    )
    sh = doc_shingles(docs, "doc_id", "text", distinct=False)
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a long, doc_b long"
    )
    got = {(r.doc_a, r.doc_b): r for r in
           signature_agreement(sh, pairs, "doc_id").collect()}
    # identical docs agree on every seed; disjoint docs on none
    assert got[(1, 2)].sig_matches == 8 and got[(1, 2)].est_bp == 10000
    assert got[(1, 3)].sig_matches == 0 and got[(1, 3)].est_bp == 0


def test_vocab_and_oov_on_crafted_corpus(spark):
    from oic_options_chains_spark.operators.vocab import oov_stats, token_vocab

    docs = spark.createDataFrame(
        [
            (1, "a a a a a b b b b b"),
            (2, "a b zzz"),
        ],
        "doc_id long, text string",
    )
    v = {r.token: r for r in token_vocab(docs, min_tf=5).collect()}
    assert set(v) == {"a", "b"}  # zzz below min_tf
    assert v["a"].tf == 6 and v["a"].df == 2 and v["a"].vocab_id == 1
    assert v["b"].tf == 6 and v["b"].vocab_id == 2  # tie -> token order
    o = {r.doc_id: r for r in
         oov_stats(docs, token_vocab(docs, min_tf=5)).collect()}
    assert o[1].n_oov == 0 and o[1].oov_bp == 0
    assert o[2].n_tokens == 3 and o[2].n_oov == 1 and o[2].oov_bp == 3333


def test_manifest_checksum_is_order_and_partition_invariant(spark, sf_dir):
    from oic_options_chains_spark.queries import QUERIES

    a = {(r.source, r.split): tuple(r) for r in
         QUERIES["q_dataset_manifest"](spark, sf_dir).collect()}
    # recompute over a repartitioned scan: identical manifest
    from oic_options_chains_spark.operators.sampling import split_assign
    from oic_options_chains_spark.operators.text import token_count_ws
    from oic_options_chains_spark.sources.registry import load_table

    d = load_table(spark, sf_dir, "documents").repartition(17)
    s = d.select(
        "doc_id", "source", "n_chars",
        token_count_ws(F.col("text")).alias("n_tok"),
        split_assign(F.col("doc_id")).alias("split"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint").alias("idh"),
    )
    b = {(r.source, r.split): tuple(r) for r in s.groupBy("source", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum("idh").cast("bigint").alias("id_checksum"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    ).collect()}
    assert a == b
    # splits cover every doc exactly once
    total = sum(v[2] for v in a.values())
    assert total == load_table(spark, sf_dir, "documents").count()
