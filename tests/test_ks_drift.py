"""Property tests for operators/robust.ks_two_sample against scipy-free
reference math (exact integer ECDF gaps)."""

from __future__ import annotations

from fractions import Fraction

import pytest


def _ref_ks(a_vals, b_vals):
    vals = sorted(set(a_vals) | set(b_vals))
    na, nb = len(a_vals), len(b_vals)
    best, at = -1, None
    ca = cb = 0
    for v in vals:
        ca += sum(1 for x in a_vals if x == v)
        cb += sum(1 for x in b_vals if x == v)
        g = abs(ca * nb - cb * na)
        if g > best:
            best, at = g, v
    return na, nb, best, at


@pytest.mark.parametrize(
    "a_vals,b_vals",
    [
        ([1, 2, 2, 3, 9], [2, 3, 3, 4]),
        ([5, 5, 5], [5, 5, 5]),          # identical -> D = 0
        ([1, 1, 1], [10, 10]),            # disjoint -> D = 1
        (list(range(50)), list(range(25, 75))),
    ],
)
def test_ks_matches_reference(spark, a_vals, b_vals):
    from oic_options_chains_spark.operators.robust import ks_two_sample

    rows = [("a", v) for v in a_vals] + [("b", v) for v in b_vals]
    df = spark.createDataFrame(rows, "g string, x long")
    got = ks_two_sample(df, "g", "x", "a", "b").collect()
    assert len(got) == 1
    r = got[0]
    na, nb, d_num, at = _ref_ks(a_vals, b_vals)
    assert (r.n_a, r.n_b, r.d_num, r.at_value) == (na, nb, d_num, at)
    # sanity on the normalized statistic
    d = Fraction(r.d_num, r.n_a * r.n_b)
    assert 0 <= d <= 1
    if sorted(a_vals) == sorted(b_vals):
        assert d == 0
    if max(a_vals) < min(b_vals):
        assert d == 1
