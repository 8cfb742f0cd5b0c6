"""Round 14 (VERDICT r13 item 5), twice-adjudicated.

First pass folded the r13 "fixed-plane-set dispersion" into the
solver: `banded_recall_bp(dispersion=True)` = the binomial plug-in
E[1-(1-(K/n)^b)^L], K ~ Binomial(n=L*b, p), and
`tables_for(dispersion=True)` inverts it with the residual margin
shrunk 400 -> 250 bp (no shipped contract moves: 0.6->45, 0.7->28,
0.8->17).

Second pass (the Monte-Carlo test below) then REFUTED the r13/r14
framing of that curve as "the mean over plane families": for a fixed
pair, agreement indicators across iid planes are iid Bernoulli(p), so
the CLOSED form is the exact mean — MC-confirmed (9487 +- 2 vs 9482 at
the 0.8 contract), with family-to-family std only ~48 bp. What
actually explains the measured planted-row deficits is finite-PROBE
sampling: a <= 256-pair probe has binomial std ~140-160 bp, and every
committed contract row sits within ~2 such sigma of the closed form:

  contract  L   closed  plug-in  measured       (closed gap, probe sigma)
  0.6       45  9409    9288     9296-9350 bp   (-113..-59, ~0.4-0.8s)
  0.7       28  9421    9264     9400-9414 bp   (-21..-7,   ~0.1s)
  0.8       17  9482    9281     9179-9250 bp   (-303..-232, ~1.6-2.1s)

The plug-in curve stays as the SOLVE TARGET because it is deliberately
conservative — Jensen pushes it ~one probe-sigma below the mean — so
the floor promise survives a low probe draw before the explicit
margin is touched. The tests pin: the MC mean identity, the plug-in's
strict conservatism, the solver's contract-point resolution (the
oracles hardcode plane counts 224/136/360), the committed rows' 9000 bp
floors, and that no committed row strays past 2.5 probe-sigma from the
closed form (i.e. no systematic loss is hiding in the screen).
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pytest

from oic_options_chains_spark.operators.similarity import (
    banded_recall_bp,
    tables_for,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_closed_form_is_the_true_mean_over_plane_families():
    """Monte Carlo at the 0.8 contract (L=17, b=8, dim 64, +-1-entry
    planes like the md5 family): the across-family mean recall must
    equal the closed form within MC error, and family-to-family std
    must be an order of magnitude below the ~150 bp probe noise —
    refuting the 'systematic fixed-plane-set loss' reading."""
    rng = np.random.default_rng(7)
    dim, L, b, c = 64, 17, 8, 0.8
    n = L * b
    closed = banded_recall_bp(c, L, dispersion=False)
    fams, pairs = 120, 1500
    means = []
    for _ in range(fams):
        planes = rng.choice([-1.0, 1.0], size=(n, dim))
        e = rng.normal(size=(pairs, dim))
        e /= np.linalg.norm(e, axis=1, keepdims=True)
        u = rng.normal(size=(pairs, dim))
        u -= (u * e).sum(1, keepdims=True) * e
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        t = c * e + math.sqrt(1 - c * c) * u
        agree = ((e @ planes.T) >= 0) == ((t @ planes.T) >= 0)
        rec = agree.reshape(pairs, L, b).all(axis=2).any(axis=1)
        means.append(rec.mean() * 10_000)
    means = np.array(means)
    se = means.std() / math.sqrt(fams)
    assert abs(means.mean() - closed) <= 4 * se + 10, (
        means.mean(), closed, se
    )
    assert means.std() < 80, "family-to-family std should be <~50-80 bp"
    # and the plug-in curve is NOT the mean — it sits far below
    assert banded_recall_bp(c, L) < means.mean() - 2 * means.std()


def test_plugin_curve_sits_below_closed_form_at_contract_points():
    for c, L in [(0.6, 45), (0.7, 28), (0.8, 17), (0.7, 12), (0.9, 8)]:
        closed = banded_recall_bp(c, L, dispersion=False)
        plug = banded_recall_bp(c, L)
        assert plug < closed, (c, L, plug, closed)


def test_curve_values_match_documented_points():
    # the numbers quoted in docstrings/SCALING: closed 9482 and plug-in
    # 9281 at (0.8, L=17); 9264 at (0.7, 28); 9288 at (0.6, 45)
    assert abs(banded_recall_bp(0.8, 17, dispersion=False) - 9482) <= 1
    assert abs(banded_recall_bp(0.8, 17) - 9281) <= 1
    assert abs(banded_recall_bp(0.7, 28) - 9264) <= 1
    assert abs(banded_recall_bp(0.6, 45) - 9288) <= 1


def test_conservative_solver_preserves_all_shipped_contracts():
    """The solve-curve change (closed+400 -> plug-in+250) must move NO
    shipped contract: the oracles hardcode the plane counts
    (224 / 136 / 360), so a solver drift breaks value hashes."""
    for c, want in [(0.6, 45), (0.7, 28), (0.8, 17)]:
        assert tables_for(c, 9250, dispersion=True) == want


def test_conservative_solver_needs_at_least_closed_form_tables():
    for c in (0.6, 0.7, 0.8):
        assert tables_for(c, 9250, dispersion=True) >= tables_for(c, 9250)


def test_conservative_solver_monotone_and_bounded():
    assert tables_for(0.5, 9250, dispersion=True) >= tables_for(
        0.7, 9250, dispersion=True
    )
    with pytest.raises(ValueError, match="dispersed"):
        tables_for(0.05, 9900, bits_per_table=16, dispersion=True)


def _planted_row(key: str, probe: str) -> dict:
    with open(os.path.join(REPO, "SCALE_CURVE.json")) as fh:
        q = json.load(fh)["queries"]
    return q[key][f"recall_bp:{probe}"]


_CONTRACTS = [
    ("q_decontam_t06", "planted_c60", 0.6, 45),
    ("q_decontam_banded", "planted_c70", 0.7, 28),
    ("q_decontam_t08", "planted_c80", 0.8, 17),
]


def test_committed_rows_within_probe_noise_of_closed_form():
    """No systematic screen loss: every committed planted row sits
    within 2.5 probe-sigma of the closed form (sigma = binomial std of
    a 200-256-pair probe at the closed-form rate) — and none sits
    meaningfully ABOVE it either (sanity against a broken probe)."""
    for key, probe, c, L in _CONTRACTS:
        closed = banded_recall_bp(c, L, dispersion=False)
        r = closed / 10_000.0
        sigma = 10_000.0 * math.sqrt(r * (1 - r) / 200)
        for sf, bp in _planted_row(key, probe).items():
            assert abs(bp - closed) <= 2.5 * sigma, (
                key, sf, bp, closed, sigma
            )


def test_all_contract_floors_hold_in_committed_curve():
    for key, probe, _, _ in _CONTRACTS:
        for sf, bp in _planted_row(key, probe).items():
            assert bp >= 9000, (key, sf, bp)
