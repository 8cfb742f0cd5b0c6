"""Connected-components dedup clustering: correctness on known graphs
(the oracle parity test covers the LSH-fed composite)."""

from __future__ import annotations

import pytest

from oic_options_chains_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)


def _cc(spark, edges):
    pairs = spark.createDataFrame(edges, "doc_a bigint, doc_b bigint")
    return {
        r.id: r.cluster_id for r in connected_components(pairs).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_path_graph_needs_propagation_rounds(spark):
    # a 9-node path: the min label must travel 8 hops — exercises the
    # iteration, not just the first join
    edges = [(i, i + 1) for i in range(1, 9)]
    got = _cc(spark, edges)
    assert set(got.values()) == {1}
    assert len(got) == 9


def test_unconverged_raises(spark, monkeypatch):
    # a 64-node path cannot star-contract to the fixpoint in one round.
    # The driver local-finish (optimization r15) would resolve a graph
    # this small before the round cap can bite, so pin it off to keep
    # the DISTRIBUTED fixpoint guard itself under test.
    from oic_options_chains_spark.operators import clusters

    monkeypatch.setattr(clusters, "LOCAL_FINISH_MAX_EDGES", 0)
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 64)], "doc_a bigint, doc_b bigint"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_rounds=1)


def test_local_finish_matches_distributed_fixpoint(spark, monkeypatch):
    # optimization r15: the <= LOCAL_FINISH_MAX_EDGES driver union-find
    # must label exactly like the distributed star rounds — same
    # components, same min-id cluster labels — including on string ids
    # (the linkage name graph) and graphs with isolated star roots.
    from oic_options_chains_spark.operators import clusters

    cases = [
        ([(1, 2), (2, 3), (10, 11), (5, 5)], "doc_a bigint, doc_b bigint"),
        ([(i, i + 1) for i in range(1, 40)], "doc_a bigint, doc_b bigint"),
        (
            [("ann", "bob"), ("bob", "cid"), ("zoe", "yui")],
            "doc_a string, doc_b string",
        ),
    ]
    for rows, schema in cases:
        pairs = spark.createDataFrame(rows, schema)
        local = {
            r.id: r.cluster_id for r in connected_components(pairs).collect()
        }
        monkeypatch.setattr(clusters, "LOCAL_FINISH_MAX_EDGES", 0)
        dist = {
            r.id: r.cluster_id
            for r in connected_components(pairs, max_rounds=30).collect()
        }
        monkeypatch.undo()
        assert local == dist, schema


def test_long_chain_converges_in_log_rounds(spark):
    # the scale case that kills O(diameter) label propagation: a
    # 401-node near-dup chain (moderately-similar docs linking A~B~C~...)
    # must converge well under the round cap — star contraction is
    # O(log), so 15 rounds is generous where propagation needs 400
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 401)], "doc_a bigint, doc_b bigint"
    )
    got = {
        r.id: r.cluster_id
        for r in connected_components(pairs, max_rounds=15).collect()
    }
    assert set(got.values()) == {1}
    assert len(got) == 401


def test_random_graphs_match_union_find(spark):
    # property check against an independent union-find reference on
    # seeded random graphs (dense, sparse, and disconnected shapes)
    import random

    def union_find_components(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    rng = random.Random(42)
    for n_nodes, n_edges in [(12, 6), (20, 30), (30, 12)]:
        edges = [
            tuple(sorted(rng.sample(range(n_nodes), 2)))
            for _ in range(n_edges)
        ]
        expected = union_find_components(edges)
        got = _cc(spark, [(a, b) for a, b in edges])
        assert got == expected, (n_nodes, n_edges, edges)


def test_dedup_clusters_keeps_singletons(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id bigint")
    pairs = spark.createDataFrame([(2, 4), (4, 6)], "doc_a bigint, doc_b bigint")
    rows = {r.doc_id: (r.cluster_id, r.is_keeper) for r in dedup_clusters(docs, pairs).collect()}
    assert rows == {
        1: (1, 1),
        2: (2, 1),
        3: (3, 1),
        4: (2, 0),
        5: (5, 1),
        6: (2, 0),
    }
