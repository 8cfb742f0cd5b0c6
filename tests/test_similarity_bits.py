"""Scale-derivation properties for the sign-bucket LSH/IVF bit widths.

A fixed bucket count is the classic LSH scale bug: the within-bucket
self-join is O((n/2^b)^2) per bucket, so b must track log2(n). These
tests lock the derivation so no scale-path entry point regresses to a
hard-coded width.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.similarity import (
    DEFAULT_TARGET_BUCKET_ROWS,
    bits_for,
    near_dup_pairs,
)
from oic_options_chains_spark.sources.registry import load_table


@given(
    n1=st.integers(min_value=1, max_value=10**12),
    n2=st.integers(min_value=1, max_value=10**12),
)
@settings(max_examples=200, deadline=None)
def test_bits_monotone_in_corpus_size(n1, n2):
    if n1 > n2:
        n1, n2 = n2, n1
    assert bits_for(n1) <= bits_for(n2)


@given(n=st.integers(min_value=1, max_value=10**12))
@settings(max_examples=200, deadline=None)
def test_bits_bounded(n):
    b = bits_for(n)
    assert 1 <= b <= 16


def test_bucket_count_tracks_corpus_growth():
    # each 2x corpus growth adds exactly one bit (2x buckets) until the cap,
    # keeping the EXPECTED bucket size ~constant at the target
    t = DEFAULT_TARGET_BUCKET_ROWS
    for k in range(1, 15):
        n = t * (2**k)
        assert bits_for(n) == k, (n, bits_for(n))
        # expected bucket rows stay at the target as n doubles
        assert n / (2 ** bits_for(n)) == t


def test_bits_cap_and_floor():
    assert bits_for(1) == 1
    assert bits_for(DEFAULT_TARGET_BUCKET_ROWS) == 1
    assert bits_for(10**12) == 16  # capped: partitioning, not sharding


def test_derived_default_matches_explicit(spark, sf_dir):
    # bits=None must behave exactly like passing bits_for(count) — the
    # derivation changes the plan knob, never the operator semantics
    e = load_table(spark, sf_dir, "embeddings")
    derived = near_dup_pairs(e, threshold=0.35)
    explicit = near_dup_pairs(e, threshold=0.35, bits=bits_for(e.count()))
    assert sorted(map(tuple, derived.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """The recall/cost trade the multi-probe variant exists for: probing
    the query bucket plus its 1-bit neighbors must recover at least as
    much of the brute-force top-10 as the single-bucket scan, and a
    non-trivial fraction of the truth (deterministic on the fixed
    synthetic embeddings)."""
    from oic_options_chains_spark.queries import QUERIES

    brute = {r.vec_id for r in QUERIES["q_ann_cosine"](spark, sf_dir).collect()}
    ivf = {r.vec_id for r in QUERIES["q_ann_ivf"](spark, sf_dir).collect()}
    multi = {
        r.vec_id for r in QUERIES["q_ann_multiprobe"](spark, sf_dir).collect()
    }
    assert len(brute & multi) >= len(brute & ivf)
    assert len(brute & multi) >= len(brute) // 2


def test_resolve_bits_counts_once_per_dataframe(spark, monkeypatch):
    from oic_options_chains_spark.operators import similarity

    df = spark.range(0, 5000).select(F.col("id").alias("vec_id"))
    calls = {"n": 0}
    cls = type(df)  # the concrete class (pyspark.sql.classic), not the ABC
    real_count = cls.count

    def counting(self):
        calls["n"] += 1
        return real_count(self)

    monkeypatch.setattr(cls, "count", counting)
    b1 = similarity._resolve_bits(df, None)
    b2 = similarity._resolve_bits(df, None)
    assert b1 == b2 == similarity.bits_for(5000)
    assert calls["n"] == 1  # second resolve served from the per-DF cache
    # an explicit bits argument never touches the data
    assert similarity._resolve_bits(df, 7) == 7
    assert calls["n"] == 1


def test_hard_negative_join_strategies_agree(spark, sf_dir):
    from oic_options_chains_spark.operators.similarity import hard_negatives
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    bc = hard_negatives(e, k=4, bits=4, broadcast_candidates=True)
    sh = hard_negatives(e, k=4, bits=4, broadcast_candidates=False)
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))


def test_near_dup_join_strategies_agree(spark, sf_dir):
    from oic_options_chains_spark.operators.similarity import near_dup_pairs
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    bc = near_dup_pairs(e, bits=4, broadcast_candidates=True)
    sh = near_dup_pairs(e, bits=4, broadcast_candidates=False)
    assert sorted(map(tuple, bc.collect())) == sorted(map(tuple, sh.collect()))


def test_registered_ann_queries_build_without_eager_count(spark, sf_dir, monkeypatch):
    """Every registered ANN/dedup query pins `bits` (and its join
    strategy) explicitly, so building its plan must never fire an eager
    sizing count() — an action hidden inside plan construction would run
    once per composition at any scale."""
    from oic_options_chains_spark.queries import QUERIES
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    cls = type(e)

    def boom(self):
        raise AssertionError("eager count() during query construction")

    monkeypatch.setattr(cls, "count", boom)
    for name in (
        "q_dedup_embedding",
        "q_hard_negatives",
        "q_ann_cosine",
        "q_ann_ivf",
        "q_ann_multiprobe",
        "q_ann_batch",
        "q_ann_batch_ivf",
        "q_ann_ivf_kmeans",
    ):
        QUERIES[name](spark, sf_dir)  # plan construction only, no action


def test_multiprobe_dominates_single_probe_recall(spark, sf_dir):
    """Probe expansion can only ADD candidates, so multiprobe recall@k
    must dominate single-probe recall@k per query — the invariant that
    justifies the 5/16 scan-cost trade."""
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.similarity import (
        ann_recall,
        batch_topk,
        batch_topk_ivf,
        batch_topk_multiprobe,
    )
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    qs = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = batch_topk(e, qs, k=10)
    single = {
        r.query_id: r.recall_bp
        for r in ann_recall(exact, batch_topk_ivf(e, qs, k=10, bits=4)).collect()
    }
    multi = {
        r.query_id: r.recall_bp
        for r in ann_recall(
            exact, batch_topk_multiprobe(e, qs, k=10, bits=4)
        ).collect()
    }
    assert set(single) == set(multi) == set(range(5))
    assert all(multi[q] >= single[q] for q in single)
    # and recall of the exact result against itself is perfect
    perfect = ann_recall(exact, exact).collect()
    assert all(r.recall_bp == 10000 for r in perfect)


def test_hot_cell_widths_per_cell(spark):
    """semantic_dedup's DEFAULT routing (round-11 rework of the old
    expected-cell global width): only cells ACTUALLY past the cap get a
    sub-LSH width, sized per cell as ceil(log2(n/cap)) and capped at 16.
    Expected-cell sizing misses clumped corpora — this keys on actuals."""
    from oic_options_chains_spark.operators.kmeans import _hot_cell_widths

    cap = 4
    sizes = {1: 3, 2: 4, 3: 5, 4: 8, 5: 9, 6: 4 * (1 << 20)}
    rows = [(cid, i) for cid, n in sizes.items() for i in range(n)]
    assigned = spark.createDataFrame(rows, "cid int, vec_id int")
    got = {
        r["cid"]: r["__w"] for r in _hot_cell_widths(assigned, cap).collect()
    }
    # cells at or under the cap pair exactly: no row at all
    assert 1 not in got and 2 not in got
    assert got[3] == 1  # 5/4 -> ceil(log2(1.25)) = 1
    assert got[4] == 1  # 8/4 -> exactly one bit
    assert got[5] == 2  # 9/4 -> ceil(log2(2.25)) = 2
    assert got[6] == 16  # 2^20 over the cap: saturates at _HOT_SUB_MAX_BITS


def test_bucketed_knn_default_bits_auto(spark, sf_dir):
    """bucketed_knn_edges with bits unset derives the sign-bucket width
    from the corpus via bits_for (round-6 fix: fixed width is
    superlinear at 10x data). At the 500-row gate corpus that is 1 bit,
    and the edges equal the explicitly-pinned bits=1 build."""
    from oic_options_chains_spark.operators.graph import bucketed_knn_edges
    from oic_options_chains_spark.operators.similarity import bits_for

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    assert bits_for(emb.count()) == 1
    auto = sorted(
        (r.src, r.dst, r.dist)
        for r in bucketed_knn_edges(emb, k=6).collect()
    )
    pinned = sorted(
        (r.src, r.dst, r.dist)
        for r in bucketed_knn_edges(emb, k=6, bits=1).collect()
    )
    assert auto == pinned and len(auto) > 0
