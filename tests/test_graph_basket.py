"""Runtime bucket-filter join, market-basket co-occurrence, and the
mutual-kNN / triangle-count graph operators."""

import itertools

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.basket import frequent_cooccurrence
from oic_options_chains_spark.operators.graph import (
    brute_knn_edges,
    knn_from_candidates,
    mutual_edges,
    triangle_counts,
)
from oic_options_chains_spark.operators.rtfilter import runtime_filter_join


def test_runtime_filter_join_matches_plain_join(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    got = runtime_filter_join(orders, cust, "o_custkey", "c_custkey").select(
        "o_orderkey", "c_custkey"
    )
    want = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_custkey"
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_runtime_filter_prune_is_a_broadcast_semi(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    plan = (
        runtime_filter_join(orders, cust, "o_custkey", "c_custkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan and "Broadcast" in plan


def test_runtime_filter_join_rejects_row_preserving_types(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    import pytest

    with pytest.raises(ValueError):
        runtime_filter_join(orders, cust, "o_custkey", "c_custkey", how="left")


def test_frequent_cooccurrence_handcrafted(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma xx"),
            (2, "alpha beta delta"),
            (3, "alpha beta gamma"),
            (4, "alpha delta rare1"),
            (5, "beta delta rare2"),
        ],
        "doc_id INT, text STRING",
    )
    # min_df=3: alpha(4) beta(4) gamma(2 out) delta(3); short 'xx' ignored
    got = {
        (r.t1, r.t2): r.n_docs
        for r in frequent_cooccurrence(
            docs, "doc_id", "text", min_df=3, max_per_doc=20, min_pair=2
        ).collect()
    }
    assert got == {
        ("alpha", "beta"): 3,
        ("alpha", "delta"): 2,
        ("beta", "delta"): 2,
    }


def test_cooccurrence_prefix_cap_keeps_rarest(spark):
    # every token frequent (min_df=1); cap 2 keeps the 2 rarest per doc
    docs = spark.createDataFrame(
        [(1, "common rare mid"), (2, "common rare mid"), (3, "common mid zzzz")],
        "doc_id INT, text STRING",
    )
    # df: common=3, mid=3, rare=2, zzzz=1 -> doc1/2 keep [rare, common?]
    # order by (df, token): rare(2) < common(3) < mid(3); doc3: zzzz(1) < common(3)
    got = {
        (r.t1, r.t2): r.n_docs
        for r in frequent_cooccurrence(
            docs, "doc_id", "text", min_df=1, max_per_doc=2, min_pair=2
        ).collect()
    }
    assert got == {("common", "rare"): 2}


def test_knn_from_candidates_rank_is_deterministic(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 10), (1, 3, 10), (1, 4, 5), (2, 1, 7), (2, 3, 8)],
        "src INT, dst INT, dist LONG",
    )
    got = sorted(
        (r.src, r.dst) for r in knn_from_candidates(pairs, k=2).collect()
    )
    # src 1: dist 5 (dst 4) then tie at 10 broken by dst -> 2
    assert got == [(1, 2), (1, 4), (2, 1), (2, 3)]


def test_mutual_edges_requires_both_directions(spark):
    knn = spark.createDataFrame(
        [(1, 2, 4), (2, 1, 4), (1, 3, 9), (3, 4, 2), (4, 3, 2)],
        "src INT, dst INT, dist LONG",
    )
    got = sorted((r.a, r.b) for r in mutual_edges(knn).collect())
    assert got == [(1, 2), (3, 4)]  # 1->3 unreciprocated


def test_triangle_counts_match_bruteforce(spark):
    # two triangles sharing edge (1,2), a hub 9 touching many nodes with
    # one closed wedge, and a triangle-free pendant
    edges = [
        (1, 2), (1, 3), (2, 3),          # triangle A
        (1, 4), (2, 4),                   # triangle B shares (1,2)
        (9, 1), (9, 2), (9, 5), (9, 6), (9, 7),  # hub; (9,1,2) closes
        (7, 8),                           # pendant path
    ]
    df = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "a INT, b INT"
    )
    got = {r.node: (r.degree, r.n_triangles) for r in triangle_counts(df).collect()}

    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {}
    for n in adj:
        tri = sum(
            1
            for v, w in itertools.combinations(sorted(adj[n]), 2)
            if w in adj[v]
        )
        expect[n] = (len(adj[n]), tri)
    assert got == expect


def test_brute_knn_is_symmetric_on_duplicate_vectors(spark):
    # identical vectors are each other's nearest neighbor at dist 0
    rows = [
        (1, [0.5, 0.5]),
        (2, [0.5, 0.5]),
        (3, [10.0, -3.0]),
        (4, [10.1, -3.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<FLOAT>")
    knn = brute_knn_edges(emb, k=1)
    got = sorted((r.src, r.dst, r.dist) for r in knn.collect())
    assert (1, 2, 0) in got and (2, 1, 0) in got
    mu = sorted((r.a, r.b) for r in mutual_edges(knn).collect())
    assert mu == [(1, 2), (3, 4)]


def test_containment_is_directional(spark):
    from oic_options_chains_spark.operators.minhash import (
        containment_pairs,
        doc_shingles,
    )

    small = "alpha beta gamma delta epsilon"
    big = small + " zeta eta theta iota kappa lam mu nu xi omicron pi rho"
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "totally different words here now")],
        "doc_id INT, text STRING",
    )
    sh = doc_shingles(docs, "doc_id", "text")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    got = {
        (r.doc_a, r.doc_b): r.containment_bp
        for r in containment_pairs(
            sh, sizes, "doc_id", min_shared=2, min_containment_bp=5000
        ).collect()
    }
    # every shingle of doc 1 appears in doc 2 -> full containment 1-in-2;
    # the reverse direction is 3/15 = 2000bp and must NOT be emitted
    assert got == {(1, 2): 10000}
