"""Semantics of exact duplicated-span removal: canonical copy survives,
later occurrences vanish, overlapping repeats merge into one deletion,
and untouched documents pass through byte-identical."""

from __future__ import annotations

from oic_options_chains_spark.operators.span_dedup import dedup_spans

DUP = "a b c d e f g h"  # one 8-token window


def _run(spark, rows, n=8):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in dedup_spans(df, n=n).collect()}


def test_canonical_kept_duplicate_removed(spark):
    got = _run(
        spark,
        [
            (1, f"x1 x2 {DUP} y1 y2"),  # first occurrence: canonical
            (2, f"z1 {DUP} z2 z3"),  # later occurrence: span deleted
        ],
    )
    assert got[1]["clean_text"] == f"x1 x2 {DUP} y1 y2"
    assert got[1]["n_removed"] == 0
    assert got[2]["clean_text"] == "z1 z2 z3"
    assert got[2]["n_removed"] == 8


def test_internal_repetition_merges_to_one_block(spark):
    # doc 4 repeats the window twice back-to-back; with the canonical
    # copy living in doc 1, BOTH of doc 4's occurrences are flagged and
    # the adjacent spans merge — the whole document is deleted.
    got = _run(spark, [(1, DUP), (4, DUP + " " + DUP)])
    assert got[1]["clean_text"] == DUP
    assert got[4]["clean_text"] == ""
    assert got[4]["n_removed"] == 16


def test_short_and_unique_docs_pass_through(spark):
    got = _run(
        spark,
        [
            (1, "too short"),  # < n tokens: no windows at all
            (2, "entirely unique tokens in this one document right here"),
        ],
    )
    assert got[1]["clean_text"] == "too short"
    assert got[2]["n_removed"] == 0
    assert got[2]["n_kept"] == got[2]["n_tokens"]


def test_counts_reconcile(spark):
    got = _run(spark, [(1, f"{DUP} tail"), (2, f"head {DUP}")])
    for r in got.values():
        assert r["n_kept"] + r["n_removed"] == r["n_tokens"]


def test_hot_fingerprint_cap_spares_boilerplate(spark):
    # The span occurs 4 times; with max_occurrences=3 it is treated as
    # boilerplate and NO occurrence is removed; uncapped, all but the
    # canonical one are removed.
    rows = [(i, f"pre{i} {DUP} post{i}") for i in range(1, 5)]
    df_rows = rows
    capped = _run_with(spark, df_rows, max_occurrences=3)
    assert all(r["n_removed"] == 0 for r in capped.values())
    uncapped = _run_with(spark, df_rows, max_occurrences=None)
    assert uncapped[1]["n_removed"] == 0
    assert all(uncapped[i]["n_removed"] == 8 for i in (2, 3, 4))


def _run_with(spark, rows, max_occurrences):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        r["doc_id"]: r
        for r in dedup_spans(df, n=8, max_occurrences=max_occurrences).collect()
    }
