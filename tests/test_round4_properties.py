"""Property-based checks for the round-4 analytics operators: the
Spark implementations must agree with brute-force Python oracles on
arbitrary small inputs, not just the handcrafted cases."""

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.graph import triangle_counts
from oic_options_chains_spark.operators.skyline import pareto_frontier
from oic_options_chains_spark.operators.sweep import max_concurrency

_points = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 40)),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(pts=_points, width=st.sampled_from([1, 3, 7, 64]))
def test_pareto_frontier_property(spark, pts, width):
    df = spark.createDataFrame(pts, "x INT, y INT")
    got = {
        (r.x, r.y): r.n_rows
        for r in pareto_frontier(df, F.col("x"), F.col("y"), bucket_width=width).collect()
    }
    import collections

    cnt = collections.Counter(pts)
    expect = {
        p: c
        for p, c in cnt.items()
        if not any(
            q != p and q[0] >= p[0] and q[1] >= p[1] for q in cnt
        )
    }
    assert got == expect


_edges = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=20,
)


@settings(max_examples=12, deadline=None)
@given(raw=_edges)
def test_triangle_counts_property(spark, raw):
    edges = sorted({(min(a, b), max(a, b)) for a, b in raw})
    df = spark.createDataFrame(edges, "a INT, b INT")
    got = {
        r.node: (r.degree, r.n_triangles) for r in triangle_counts(df).collect()
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expect = {
        n: (
            len(adj[n]),
            sum(
                1
                for v, w in itertools.combinations(sorted(adj[n]), 2)
                if w in adj[v]
            ),
        )
        for n in adj
    }
    assert got == expect


_intervals = st.lists(
    st.tuples(st.integers(0, 50), st.integers(1, 10)),
    min_size=1,
    max_size=20,
)


@settings(max_examples=12, deadline=None)
@given(iv=_intervals)
def test_max_concurrency_property(spark, iv):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("g", t0 + dt.timedelta(minutes=s), t0 + dt.timedelta(minutes=s + d), i)
        for i, (s, d) in enumerate(iv)
    ]
    df = spark.createDataFrame(rows, "grp STRING, s TIMESTAMP, e TIMESTAMP, id INT")
    r = max_concurrency(df, "grp", F.col("s"), F.col("e"), "id").collect()[0]
    # brute force: concurrency at each open instant over half-open intervals
    best, best_t = 0, None
    for s, d in sorted(iv):
        c = sum(1 for s2, d2 in iv if s2 <= s < s2 + d2)
        if c > best:
            best, best_t = c, s
    assert r.max_concurrent == best
    assert r.first_peak_ts == t0 + dt.timedelta(minutes=best_t)
