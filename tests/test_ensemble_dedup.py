"""Ensemble dedup semantics: union of evidence edges closes
transitively across signals, provenance bits OR per document, exact
star edges produce the same components as all-pairs."""

from __future__ import annotations

from oic_options_chains_spark.operators.clusters import (
    ensemble_dedup,
    exact_star_edges,
)


def _docs(spark, ids):
    return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "doc_a bigint, doc_b bigint"
    )


def test_cross_signal_transitive_closure(spark):
    # 1=2 exactly, 2~3 semantically: all three land in cluster 1, and
    # the bitmask records WHICH signal implicated each doc
    docs = _docs(spark, [1, 2, 3, 4])
    got = {
        r["doc_id"]: r
        for r in ensemble_dedup(
            docs,
            {1: _edges(spark, [(1, 2)]), 4: _edges(spark, [(2, 3)])},
        ).collect()
    }
    assert {got[i]["cluster_id"] for i in (1, 2, 3)} == {1}
    assert got[1]["is_keeper"] == 1
    assert got[2]["is_keeper"] == got[3]["is_keeper"] == 0
    assert got[1]["signals"] == 1  # only the exact edge touches doc 1
    assert got[2]["signals"] == 5  # exact + embedding
    assert got[3]["signals"] == 4
    assert got[4]["cluster_id"] == 4 and got[4]["signals"] == 0


def test_same_pair_from_two_signals_ors_bits(spark):
    docs = _docs(spark, [10, 11])
    got = {
        r["doc_id"]: r
        for r in ensemble_dedup(
            docs,
            {2: _edges(spark, [(10, 11)]), 4: _edges(spark, [(11, 10)])},
        ).collect()
    }
    # reversed orientation normalizes; bits OR on the single edge
    assert got[10]["signals"] == got[11]["signals"] == 6
    assert got[11]["cluster_id"] == 10


def test_exact_star_edges_match_group_min(spark):
    df = spark.createDataFrame(
        [
            (1, "same  text"),  # whitespace-normalized: dup of 3
            (3, "same text"),
            (5, "Same Text"),  # lowercased: dup too
            (7, "different"),
        ],
        "doc_id bigint, text string",
    )
    edges = {(r["doc_a"], r["doc_b"]) for r in exact_star_edges(df).collect()}
    assert edges == {(1, 3), (1, 5)}


def test_random_multisignal_graphs_match_union_find(spark):
    import random

    rnd = random.Random(77)
    for trial in range(3):
        n = 40
        sigs = {}
        for bit in (1, 2, 4):
            edges = [
                (rnd.randrange(n), rnd.randrange(n))
                for _ in range(rnd.randrange(5, 25))
            ]
            sigs[bit] = [(a, b) for a, b in edges if a != b]

        # reference union-find over the union of all signals
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for edges in sigs.values():
            for a, b in edges:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        want_cluster = {v: find(v) for v in range(n)}
        want_signals = {v: 0 for v in range(n)}
        for bit, edges in sigs.items():
            for a, b in edges:
                want_signals[a] |= bit
                want_signals[b] |= bit

        docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id bigint")
        sources = {
            bit: spark.createDataFrame(e, "doc_a bigint, doc_b bigint")
            for bit, e in sigs.items()
            if e
        }
        got = {r["doc_id"]: r for r in ensemble_dedup(docs, sources).collect()}
        for v in range(n):
            assert got[v]["cluster_id"] == want_cluster[v], (trial, v)
            assert got[v]["signals"] == want_signals[v], (trial, v)
            assert got[v]["is_keeper"] == int(v == want_cluster[v])


def test_null_text_never_links(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, "x")], "doc_id bigint, text string"
    )
    assert exact_star_edges(df).count() == 0
