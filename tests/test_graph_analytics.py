"""pagerank_int and the funnel/cohort event analytics."""

import datetime

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.clusters import pagerank_int


def test_pagerank_hand_computed(spark):
    # undirected path a - b - c (symmetrized): deg a=1, b=2, c=1
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")], "src string, dst string"
    )
    got = {r.node: (r.pr, r.degree) for r in pagerank_int(edges, iters=1).collect()}
    # iter1: contrib a->b = 1000000//1, b->a = b->c = 1000000//2, c->b = 1000000//1
    # pr(a) = pr(c) = 150000 + 85*500000//100 = 575000
    # pr(b) = 150000 + 85*2000000//100 = 1850000
    assert got == {"a": (575000, 1), "b": (1850000, 2), "c": (575000, 1)}


def test_pagerank_mass_conservation_ish(spark):
    # on a regular graph (cycle), ranks stay exactly at scale
    n = 6
    rows = [(f"n{i}", f"n{(i + 1) % n}") for i in range(n)] + [
        (f"n{(i + 1) % n}", f"n{i}") for i in range(n)
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    prs = {r.node: r.pr for r in pagerank_int(edges, iters=3).collect()}
    assert set(prs.values()) == {1_000_000}


def test_pagerank_determinism_under_partitioning(spark):
    rows = [(f"u{i % 7}", f"v{i % 5}") for i in range(60)] + [
        (f"v{i % 5}", f"u{i % 7}") for i in range(60)
    ]
    e1 = spark.createDataFrame(rows, "src string, dst string").repartition(1)
    e2 = spark.createDataFrame(rows, "src string, dst string").repartition(13, "dst")
    r1 = sorted(tuple(r) for r in pagerank_int(e1, iters=2).collect())
    r2 = sorted(tuple(r) for r in pagerank_int(e2, iters=2).collect())
    assert r1 == r2


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_funnel_requires_order_and_window(spark, monkeypatch):
    from oic_options_chains_spark.queries.events import q_funnel
    import oic_options_chains_spark.queries.events as ev_mod

    t0 = datetime.datetime(2024, 1, 1)

    def mins(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [
        # user 1: full ordered funnel within windows -> depth 3
        (1, mins(0), 1, "view"),
        (2, mins(10), 1, "click"),
        (3, mins(20), 1, "purchase"),
        # user 2: click BEFORE view -> depth 1
        (4, mins(0), 2, "click"),
        (5, mins(10), 2, "view"),
        # user 3: purchase 25h after click -> depth 2 (window expired)
        (6, mins(0), 3, "view"),
        (7, mins(10), 3, "click"),
        (8, mins(10 + 25 * 60), 3, "purchase"),
        # user 4: no view at all -> depth 0
        (9, mins(0), 4, "error"),
    ]
    monkeypatch.setattr(ev_mod, "load_table", lambda spark, sf, name: _ev(spark, rows))
    got = {r.depth: r.n_users for r in q_funnel(spark, "unused").collect()}
    assert got == {3: 1, 1: 1, 2: 1, 0: 1}


def test_cohort_retention_offsets(spark, monkeypatch):
    import oic_options_chains_spark.queries.events as ev_mod
    from oic_options_chains_spark.queries.events import q_cohort_retention

    # Monday 2024-01-01; user 1 active week 0 and week 2, user 2 week 0
    rows = [
        (1, datetime.datetime(2024, 1, 2), 1, "view"),
        (2, datetime.datetime(2024, 1, 17), 1, "view"),
        (3, datetime.datetime(2024, 1, 4), 2, "click"),
    ]
    monkeypatch.setattr(ev_mod, "load_table", lambda spark, sf, name: _ev(spark, rows))
    got = {
        (str(r.cohort_week), r.week_offset): r.n_users
        for r in q_cohort_retention(spark, "unused").collect()
    }
    assert got == {("2024-01-01", 0): 2, ("2024-01-01", 2): 1}


def test_label_propagation_frontier_semantics(spark):
    from oic_options_chains_spark.operators.graph import label_propagation

    # path graph 0-1-2-3-4 plus a triangle 5-6-7; seeds: 0 (label 10),
    # 4 (label 20), 5 (label 30)
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (5, 6), (6, 7), (5, 7)],
        "a long, b long",
    )
    seeds = spark.createDataFrame(
        [(0, 10), (4, 20), (5, 30)], "node long, label int"
    )
    got = {
        r.node: (r.label, r.round)
        for r in label_propagation(edges, seeds, rounds=2).collect()
    }
    assert got[0] == (10, 0) and got[4] == (20, 0) and got[5] == (30, 0)
    # round 1 frontier: 1 from 0; 3 from 4; 6 and 7 from 5
    assert got[1] == (10, 1) and got[3] == (20, 1)
    assert got[6] == (30, 1) and got[7] == (30, 1)
    # round 2: node 2 sees labeled neighbors 1 (10) and 3 (20) — one
    # vote each, tie breaks to the LOWER label
    assert got[2] == (10, 2)
    # frozen labels never flip: rerunning with more rounds changes nothing
    again = {
        r.node: (r.label, r.round)
        for r in label_propagation(edges, seeds, rounds=3).collect()
    }
    assert again == got


def test_label_propagation_isolated_nodes_stay_unlabeled(spark):
    from oic_options_chains_spark.operators.graph import label_propagation

    edges = spark.createDataFrame([(0, 1)], "a long, b long")
    seeds = spark.createDataFrame([(0, 7)], "node long, label int")
    got = label_propagation(edges, seeds, rounds=2).collect()
    assert {r.node for r in got} == {0, 1}  # node 2 never existed; 1 joins


def test_kcore_peels_tails_keeps_clique(spark):
    from oic_options_chains_spark.operators.graph import kcore_membership

    # K4 clique (1-4) with a tail 4-5-6: the tail peels (degree < 3),
    # the clique survives with core degree 3
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    ndf = spark.createDataFrame([(i,) for i in range(1, 8)], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = {
        r["node"]: (r["in_core"], r["core_degree"])
        for r in kcore_membership(ndf, edf, k=3, rounds=8).collect()
    }
    assert got == {
        1: (1, 3), 2: (1, 3), 3: (1, 3), 4: (1, 3),
        5: (0, 0), 6: (0, 0), 7: (0, 0),
    }


def test_kcore_cascading_peel_needs_multiple_rounds(spark):
    from oic_options_chains_spark.operators.graph import kcore_membership

    # chain 1-2-3-4-5 with k=2: endpoints peel first, the collapse
    # cascades inward round by round until nothing survives
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    ndf = spark.createDataFrame([(i,) for i in range(1, 6)], "node bigint")
    edf = spark.createDataFrame(edges, "src bigint, dst bigint")
    got = kcore_membership(ndf, edf, k=2, rounds=8).collect()
    assert all(r["in_core"] == 0 for r in got)


def test_kcore_random_graphs_match_reference(spark):
    import random

    def py_kcore(nodes, edges, k):
        adj = {n: set() for n in nodes}
        for a, b in edges:
            if a != b:
                adj[a].add(b)
                adj[b].add(a)
        alive = set(nodes)
        changed = True
        while changed:
            changed = False
            for n in list(alive):
                if len(adj[n] & alive) < k:
                    alive.discard(n)
                    changed = True
        return {
            n: (int(n in alive), len(adj[n] & alive) if n in alive else 0)
            for n in nodes
        }

    from oic_options_chains_spark.operators.graph import kcore_membership

    rnd = random.Random(13)
    for trial in range(3):
        n = 30
        nodes = list(range(n))
        edges = list(
            {
                tuple(sorted((rnd.randrange(n), rnd.randrange(n))))
                for _ in range(rnd.randrange(20, 70))
            }
        )
        edges = [(a, b) for a, b in edges if a != b]
        want = py_kcore(nodes, edges, k=3)
        ndf = spark.createDataFrame([(x,) for x in nodes], "node bigint")
        edf = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {
            r["node"]: (r["in_core"], r["core_degree"])
            for r in kcore_membership(ndf, edf, k=3, rounds=30).collect()
        }
        assert got == want, trial
