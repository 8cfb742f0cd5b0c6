"""Property tests for the round-8 operators: brute-force equivalence
for FD profiling, pigeonhole completeness for the banded aHash search,
and survivorship determinism for entity resolution."""

from __future__ import annotations

from collections import Counter

import pytest

# full-profile only (r16): scale-heavy suite moved out of the driver's
# default pytest budget; tools/run_suite.py (-m "") still runs it
pytestmark = pytest.mark.full
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 3)), min_size=1, max_size=60
    )
)
def test_fd_profile_matches_bruteforce(spark_session_global, rows):
    """fd_profile's g3 violations equal the brute-force definition:
    rows minus the sum over lhs groups of the majority rhs count."""
    from oic_options_chains_spark.operators.profiling import fd_profile

    spark = spark_session_global
    df = spark.createDataFrame(rows, "k int, v int")
    got = {
        r["fd"]: r.asDict() for r in fd_profile(df, [("k", "v")]).collect()
    }["k->v"]
    per_lhs: dict[int, Counter] = {}
    for k, v in rows:
        per_lhs.setdefault(k, Counter())[v] += 1
    keep = sum(c.most_common(1)[0][1] for c in per_lhs.values())
    assert got["n_rows"] == len(rows)
    assert got["n_lhs"] == len(per_lhs)
    assert got["n_pairs"] == len({(k, v) for k, v in rows})
    assert got["violations"] == len(rows) - keep
    assert got["holds"] == int(len(rows) == keep)


@settings(max_examples=200, deadline=None)
@given(
    h1=st.integers(0, (1 << 64) - 1),
    flips=st.lists(st.integers(0, 63), min_size=0, max_size=3, unique=True),
)
def test_band_pigeonhole_completeness(h1, flips):
    """Any pair within Hamming distance 3 shares at least one of the
    four 16-bit bands — the exactness guarantee of the banded search
    (3 flipped bits can corrupt at most 3 of 4 bands)."""
    from oic_options_chains_spark.operators.phash import bands_of

    h2 = h1
    for b in flips:
        h2 ^= 1 << b
    b1, b2 = bands_of(h1), bands_of(h2)
    assert any(x == y for x, y in zip(b1, b2))
    # and the banded Hamming reconstruction is exact
    ham = sum(bin(x ^ y).count("1") for x, y in zip(b1, b2))
    assert ham == bin(h1 ^ h2).count("1") == len(flips)


@settings(max_examples=15, deadline=None)
@given(
    names=st.lists(
        st.sampled_from(["blue bolt", "blue bol", "red gear", "red gea", "tan cog"]),
        min_size=2,
        max_size=24,
    )
)
def test_entity_assignment_is_a_total_partition(spark_session_global, names):
    """Every record gets exactly one entity; records with equal names
    always share an entity; entity_id is the component's min rec_id."""
    from oic_options_chains_spark.operators.linkage import resolve_entities

    spark = spark_session_global
    records = spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "rec_id int, name string"
    )
    assign = {r.rec_id: r.entity_id for r in resolve_entities(records).collect()}
    assert sorted(assign) == list(range(len(names)))
    by_name: dict[str, set[int]] = {}
    for i, n in enumerate(names):
        by_name.setdefault(n, set()).add(assign[i])
    for n, ents in by_name.items():
        assert len(ents) == 1, f"name {n!r} split across entities"
    # entity label is the minimum member id
    members: dict[int, list[int]] = {}
    for rec, ent in assign.items():
        members.setdefault(ent, []).append(rec)
    for ent, recs in members.items():
        assert ent == min(recs)


@pytest.fixture(scope="module")
def spark_session_global(spark):
    return spark
