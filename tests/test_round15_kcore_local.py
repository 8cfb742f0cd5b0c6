"""Optimization r15: the bounded driver peel finish in
``kcore_membership`` must produce exactly the distributed loop's
survivor set and degrees — same membership, same core_degree — on
graphs that exercise the peeling dynamics (full peel-out, stable core,
chains, string ids, isolated nodes, round-budget exhaustion)."""

from __future__ import annotations

from oic_options_chains_spark.operators.graph import kcore_membership


def _run(spark, nodes, edges, node_schema, edge_schema, k, rounds):
    n = spark.createDataFrame([(x,) for x in nodes], node_schema)
    e = spark.createDataFrame(edges, edge_schema)
    return {
        r.node: (r.in_core, r.core_degree)
        for r in kcore_membership(n, e, k=k, rounds=rounds).collect()
    }


CASES = [
    # triangle + pendant: triangle survives k=2, pendant peels
    ([1, 2, 3, 4, 9], [(1, 2), (2, 3), (1, 3), (3, 4)], 2, 8),
    # chain: fully peels at k=2
    (list(range(1, 12)), [(i, i + 1) for i in range(1, 11)], 2, 8),
    # 4-clique at k=3 survives; attached path peels over several rounds
    (
        list(range(1, 9)),
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)],
        3,
        8,
    ),
    # round budget smaller than needed for full convergence
    (list(range(1, 12)), [(i, i + 1) for i in range(1, 11)], 2, 2),
]


def test_local_peel_matches_distributed(spark, monkeypatch):
    from oic_options_chains_spark.operators import clusters

    for nodes, edges, k, rounds in CASES:
        local = _run(
            spark, nodes, edges, "node bigint",
            "src bigint, dst bigint", k, rounds,
        )
        monkeypatch.setattr(clusters, "LOCAL_FINISH_MAX_EDGES", 0)
        dist = _run(
            spark, nodes, edges, "node bigint",
            "src bigint, dst bigint", k, rounds,
        )
        monkeypatch.undo()
        assert local == dist, (nodes, edges, k, rounds)


def test_local_peel_string_ids(spark, monkeypatch):
    from oic_options_chains_spark.operators import clusters

    nodes = ["a", "b", "c", "d", "e"]
    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    local = _run(
        spark, nodes, edges, "node string", "src string, dst string", 2, 8
    )
    monkeypatch.setattr(clusters, "LOCAL_FINISH_MAX_EDGES", 0)
    dist = _run(
        spark, nodes, edges, "node string", "src string, dst string", 2, 8
    )
    monkeypatch.undo()
    assert local == dist
    assert local["e"] == (0, 0)  # never-edged node reports (0, 0)


def test_local_peel_empty_edges(spark):
    n = spark.createDataFrame([(1,), (2,)], "node bigint")
    e = spark.createDataFrame([], "src bigint, dst bigint")
    got = {
        r.node: (r.in_core, r.core_degree)
        for r in kcore_membership(n, e, k=3, rounds=4).collect()
    }
    assert got == {1: (0, 0), 2: (0, 0)}
