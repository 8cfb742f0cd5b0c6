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
