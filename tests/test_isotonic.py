"""Isotonic calibration: the relational minimax form must equal the
classic sequential pool-adjacent-violators fit, and the output must be
monotone with bin totals reconciling to the input."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from oic_options_chains_spark.operators.robust import isotonic_calibration


def _pav(rates: list[tuple[int, int]]) -> list[Fraction]:
    """Classic PAV over (pos, n) bins -> fitted rate per bin."""
    blocks: list[list[int]] = []  # [pos, n, width]
    for p, n in rates:
        blocks.append([p, n, 1])
        while len(blocks) > 1 and Fraction(
            blocks[-1][0], blocks[-1][1]
        ) < Fraction(blocks[-2][0], blocks[-2][1]):
            p2, n2, w2 = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += n2
            blocks[-1][2] += w2
        # merging can cascade leftward
        while len(blocks) > 1 and Fraction(
            blocks[-1][0], blocks[-1][1]
        ) < Fraction(blocks[-2][0], blocks[-2][1]):
            p2, n2, w2 = blocks.pop()
            blocks[-1][0] += p2
            blocks[-1][1] += n2
            blocks[-1][2] += w2
    out: list[Fraction] = []
    for p, n, w in blocks:
        out.extend([Fraction(p, n)] * w)
    return out


@settings(max_examples=10, deadline=None)
@given(
    targets=st.lists(st.integers(0, 1), min_size=10, max_size=40),
)
def test_minimax_equals_pav(spark, targets):
    rows = [("s", i, t) for i, t in enumerate(targets)]
    df = spark.createDataFrame(rows, "source string, score bigint, pos int")
    got = {
        r["bin"]: r
        for r in isotonic_calibration(
            df, "source", ["score"], "pos", n_bins=5
        ).collect()
    }
    # rebuild the bin (pos, n) the operator's exact ranking produces
    n = len(targets)
    bins: dict[int, list[int]] = {}
    for i, t in enumerate(sorted(range(n), key=lambda j: (rows[j][1],))):
        b = i * 5 // n + 1
        bins.setdefault(b, [0, 0])
        bins[b][0] += targets[t]
        bins[b][1] += 1
    ordered = [tuple(bins[b]) for b in sorted(bins)]
    expect = _pav(ordered)
    for idx, b in enumerate(sorted(bins)):
        r = got[b]
        assert (r["n_pos"], r["n_docs"]) == ordered[idx]
        assert r["iso_e6"] == (1_000_000 * expect[idx].numerator) // (
            expect[idx].denominator
        ), (b, ordered, expect)
    vals = [got[b]["iso_e6"] for b in sorted(got)]
    assert vals == sorted(vals)
