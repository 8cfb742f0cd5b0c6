"""Property tests for nearest-selection (J3/J4) — the invariants SURVEY.md
section 5.2 commits to:

- the winner's distance is <= every candidate's distance to the target;
- on distance ties the SMALLEST candidate wins (the deterministic
  re-expression of the reference's first-in-parse-order fold,
  transform-load.2025-08-19.rkt:52-57 — parse order is ascending).

Cases are packed into one DataFrame keyed by case_id so each hypothesis
example costs a single Spark job.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oic_options_chains_spark.operators.nearest import nearest_selection

_case = st.tuples(
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=8, unique=True),
    st.lists(st.integers(-1000, 1000), min_size=1, max_size=4, unique=True),
)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_case, min_size=1, max_size=25))
def test_nearest_selection_invariants(spark, cases):
    cand_rows = [
        (cid, Decimal(v)) for cid, (cands, _) in enumerate(cases) for v in cands
    ]
    target_rows = [
        (cid, Decimal(t)) for cid, (_, targets) in enumerate(cases) for t in targets
    ]
    candidates = spark.createDataFrame(
        cand_rows, "case_id int, value decimal(10,2)"
    )
    targets = spark.createDataFrame(
        target_rows, "case_id int, target decimal(10,2)"
    )
    got = {
        (r.case_id, r.target): (r.value, r.distance)
        for r in nearest_selection(
            candidates, ["case_id"], "value", targets, "target"
        ).collect()
    }
    for cid, (cands, tgts) in enumerate(cases):
        for t in tgts:
            value, distance = got[(cid, Decimal(t))]
            best = min(cands, key=lambda v: (abs(v - t), v))
            assert value == Decimal(best)
            assert distance == abs(Decimal(best) - Decimal(t))
            assert all(distance <= abs(Decimal(v) - Decimal(t)) for v in cands)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),        # key
            st.integers(0, 1000),     # orderable value
            st.integers(-100, 100),   # payload
        ),
        min_size=1,
        max_size=60,
    )
)
def test_latest_per_key_invariants(spark, rows):
    """latest_per_key: exactly one row per key; its order value is the key's
    maximum; tie broken by the highest payload (the declared tiebreak)."""
    from oic_options_chains_spark.operators.asof import latest_per_key

    df = spark.createDataFrame(rows, "k int, v int, payload int")
    got = {
        r.k: (r.v, r.payload)
        for r in latest_per_key(df, ["k"], "v", tiebreak=["payload"]).collect()
    }
    keys = {k for k, _, _ in rows}
    assert set(got) == keys
    for k in keys:
        group = [(v, p) for kk, v, p in rows if kk == k]
        assert got[k] == max(group)


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.tuples(st.integers(0, 8), st.integers(-50, 50)),
             min_size=0, max_size=30, unique_by=lambda r: r[0]),
    st.lists(st.tuples(st.integers(0, 8), st.integers(-50, 50)),
             min_size=0, max_size=30, unique_by=lambda r: r[0]),
)
def test_upsert_invariants(spark, target_rows, batch_rows):
    """upsert (K3): result keys = target ∪ batch; batch payload wins on
    overlap; target-only payloads untouched; no duplicate keys."""
    from oic_options_chains_spark.operators.merge import upsert

    schema = "k int, payload int"
    target = spark.createDataFrame(target_rows, schema)
    batch = spark.createDataFrame(batch_rows, schema)
    got = {r.k: r.payload for r in upsert(target, batch, ["k"]).collect()}
    t, b = dict(target_rows), dict(batch_rows)
    assert got == {**t, **b}
