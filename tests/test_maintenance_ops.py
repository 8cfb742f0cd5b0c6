"""Unit tests for the round-4 maintenance operators: SCD2 history,
compaction planning, HLL intersection, positional postings, and
SemDeDup — semantics on hand-built frames plus the plan properties the
scale arguments rest on.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.cdc import scd2_history
from oic_options_chains_spark.operators.kmeans import kmeans_fit, semantic_dedup
from oic_options_chains_spark.operators.layout import (
    compaction_bins,
    compaction_plan,
)
from oic_options_chains_spark.operators.ranking import posting_lists
from oic_options_chains_spark.operators.sketches import hll_intersect_estimate
from oic_options_chains_spark.sources.registry import load_table


def _ts(h):
    return dt.datetime(2024, 1, 1, h)


def test_scd2_collapses_runs_and_chains_intervals(spark):
    rows = [
        (1, "a", _ts(1), 10),
        (1, "a", _ts(2), 11),
        (1, "b", _ts(3), 12),
        (1, "a", _ts(4), 13),  # back to 'a': NEW island, not merged
        (2, "x", _ts(1), 20),
    ]
    df = spark.createDataFrame(
        rows, "user_id INT, event_type STRING, ts TIMESTAMP, event_id INT"
    )
    out = scd2_history(df, "user_id", "event_type", "ts", "event_id")
    got = {
        (r.user_id, r.version): r
        for r in out.collect()
    }
    assert len(got) == 4
    r1 = got[(1, 1)]
    assert (r1.event_type, r1.n_rows) == ("a", 2)
    assert r1.effective_from == _ts(1) and r1.effective_to == _ts(3)
    r2 = got[(1, 2)]
    assert (r2.event_type, r2.effective_to) == ("b", _ts(4))
    r3 = got[(1, 3)]
    assert r3.event_type == "a" and r3.effective_to is None
    assert got[(2, 1)].effective_to is None


def test_scd2_single_exchange(spark):
    df = spark.createDataFrame(
        [(1, "a", _ts(1), 1)],
        "user_id INT, event_type STRING, ts TIMESTAMP, event_id INT",
    )
    plan = (
        scd2_history(df, "user_id", "event_type", "ts", "event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # both windows and the island aggregate key on user_id: one shuffle
    assert plan.count("Exchange hashpartitioning") == 1


def test_compaction_next_fit_bound(spark):
    # files of size 700 against a 1000 target: next-fit packs 700, 700
    # (bin 0, 1), ... each bin holds the file that crossed its boundary
    rows = [("p", i, 700) for i in range(6)]
    df = spark.createDataFrame(rows, "part STRING, file INT, size INT")
    plan = compaction_plan(df, "part", "file", "size", 1000)
    got = {r.file: r.bin for r in plan.collect()}
    # cumulative: 700,1400,2100,2800,3500,4200 -> prior-cum div 1000
    assert got == {0: 0, 1: 0, 2: 1, 3: 2, 4: 2, 5: 3}
    bins = {(r.part, r.bin): r for r in compaction_bins(plan).collect()}
    assert bins[("p", 0)].n_files == 2 and bins[("p", 0)].bin_bytes == 1400
    # every bin except its boundary-crossing file stays under target
    for r in bins.values():
        assert r.bin_bytes - 700 < 1000


def test_compaction_partitions_do_not_interact(spark):
    rows = [("a", 0, 900), ("b", 0, 900), ("a", 1, 900), ("b", 1, 900)]
    df = spark.createDataFrame(rows, "part STRING, file INT, size INT")
    got = {(r.part, r.file): r.bin for r in compaction_plan(
        df, "part", "file", "size", 1000
    ).collect()}
    # each partition restarts its own running sum
    assert got == {("a", 0): 0, ("a", 1): 0, ("b", 0): 0, ("b", 1): 0}


def test_hll_intersect_tracks_true_overlap(spark):
    # A = 0..999, B = 500..1499 -> true intersection 500
    a = spark.range(0, 1000).select(F.col("id").alias("k"))
    b = spark.range(500, 1500).select(F.col("id").alias("k"))
    row = hll_intersect_estimate(a, "k", b, "k", b=8).collect()[0]
    # HLL b=8 standard error ~6.5%; allow 4 sigma on each component
    assert abs(row.est_left - 1000) < 260
    assert abs(row.est_right - 1000) < 260
    assert abs(row.est_union - 1500) < 390
    assert row.est_intersect == row.est_left + row.est_right - row.est_union
    assert abs(row.est_intersect - 500) < 500


def test_posting_positions_match_python(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").limit(50)
    got = {
        (r.term, r.doc_id): (r.tf, r.positions)
        for r in posting_lists(d, ["table", "scan"]).collect()
    }
    for row in d.select("doc_id", "text").collect():
        toks = row.text.lower().split(" ")
        for term in ("table", "scan"):
            pos = [i for i, t in enumerate(toks) if t == term]
            if pos:
                assert got[(term, row.doc_id)] == (
                    len(pos),
                    ",".join(str(p) for p in pos),
                )
            else:
                assert (term, row.doc_id) not in got


def test_semdedup_rule_matches_bruteforce(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    eps = 22_000_000
    dropped = {
        r.vec_id: (r.cid, r.keeper, r.dist)
        for r in semantic_dedup(e, eps=eps, k=8, iters=2).collect()
    }
    assigned, _ = kmeans_fit(e, k=8, iters=2)
    rows = assigned.collect()
    by_cid: dict[int, list] = {}
    for r in rows:
        by_cid.setdefault(r.cid, []).append((r.vec_id, r.qarr))
    expect = {}
    for members in by_cid.values():
        members.sort()
        for i, (vid, q) in enumerate(members):
            for uid, uq in members[:i]:
                d = sum((a - b) * (a - b) for a, b in zip(q, uq))
                if d <= eps:
                    expect[vid] = (uid, d)
                    break  # members sorted: first hit IS min keeper
    assert set(dropped) == set(expect)
    for vid, (cid, keeper, dist) in dropped.items():
        assert (keeper, dist) == expect[vid]
        assert keeper < vid and dist <= eps


def test_group_trend_exact_line_and_degenerate_group(spark):
    from oic_options_chains_spark.operators.trend import group_linear_trend

    rows = (
        # grp "up": y = 10x + 7 exactly
        [("up", x, 10 * x + 7) for x in range(5)]
        # grp "down": y = -3x + 100
        + [("down", x, -3 * x + 100) for x in range(4)]
        # grp "flat-x": all x equal -> den = 0 -> NULL fit
        + [("flat-x", 2, y) for y in (5, 9)]
    )
    df = spark.createDataFrame(rows, "grp STRING, x INT, y INT")
    got = {
        r.grp: r
        for r in group_linear_trend(
            df, "grp", F.col("x"), F.col("y")
        ).collect()
    }
    assert (got["up"].slope, got["up"].intercept) == (10, 7)
    assert (got["down"].slope, got["down"].intercept) == (-3, 100)
    assert got["flat-x"].slope is None and got["flat-x"].intercept is None
    assert got["flat-x"].den == "0"


def test_pareto_frontier_matches_bruteforce(spark):
    from oic_options_chains_spark.operators.skyline import pareto_frontier

    pts = [
        (1, 10), (1, 10), (2, 9), (2, 11), (3, 11), (4, 5),
        (5, 11), (6, 4), (7, 3), (7, 3), (7, 2), (130, 1),
    ]
    df = spark.createDataFrame(pts, "x INT, y INT")
    got = {(r.x, r.y): r.n_rows for r in pareto_frontier(
        df, F.col("x"), F.col("y"), bucket_width=3
    ).collect()}
    # brute force weak dominance over distinct pairs
    import collections
    cnt = collections.Counter(pts)
    distinct = set(cnt)
    expect = {}
    for p in distinct:
        if not any(q != p and q[0] >= p[0] and q[1] >= p[1] for q in distinct):
            expect[p] = cnt[p]
    assert got == expect
    # (5, 11) beats (2, 11)/(3, 11) at equal y; (130, 1) always survives
    assert (5, 11) in got and (2, 11) not in got and (130, 1) in got


def test_max_concurrency_half_open_boundaries(spark):
    import datetime as dt

    from oic_options_chains_spark.operators.sweep import max_concurrency

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(mins):
        return t0 + dt.timedelta(minutes=mins)

    rows = [
        # grp "a": [0,10) [5,15) [9,19) overlap 3-deep at t=9;
        # [19,29) starts exactly when [9,19) closes -> NOT concurrent
        ("a", ts(0), ts(10), 1),
        ("a", ts(5), ts(15), 2),
        ("a", ts(9), ts(19), 3),
        ("a", ts(19), ts(29), 4),
        # grp "b": disjoint singletons, peak 1 first reached at t=0
        ("b", ts(0), ts(1), 5),
        ("b", ts(2), ts(3), 6),
    ]
    df = spark.createDataFrame(
        rows, "grp STRING, s TIMESTAMP, e TIMESTAMP, id INT"
    )
    got = {
        r.grp: (r.max_concurrent, r.first_peak_ts)
        for r in max_concurrency(
            df, "grp", F.col("s"), F.col("e"), "id"
        ).collect()
    }
    assert got == {"a": (3, ts(9)), "b": (1, ts(0))}


def test_group_changepoint_finds_the_step(spark):
    from oic_options_chains_spark.operators.trend import group_changepoint

    rows = (
        # clean step after x=3: means 10 vs 50
        [("step", x, 10) for x in (1, 2, 3)]
        + [("step", x, 50) for x in (4, 5)]
        # pure trend: best split of 1..4 / 5..6? exact SSE argmin with
        # earliest-split tie-break is computed by brute force below
        + [("ramp", x, x * 7) for x in range(1, 7)]
    )
    df = spark.createDataFrame(rows, "grp STRING, x INT, y INT")
    got = {
        r.grp: (r.split_x, r.n_left, r.n_right, r.mean_left, r.mean_right)
        for r in group_changepoint(df, "grp", F.col("x"), F.col("y")).collect()
    }
    assert got["step"] == (3, 3, 2, 10, 50)

    from fractions import Fraction

    ys = [x * 7 for x in range(1, 7)]

    def sse(seg):
        n = len(seg)
        return Fraction(sum(v * v for v in seg)) - Fraction(sum(seg)) ** 2 / n

    best = min(
        range(1, 6), key=lambda j: (sse(ys[:j]) + sse(ys[j:]), j)
    )
    assert got["ramp"][0] == best
    assert got["ramp"][3] == sum(ys[:best]) // best
