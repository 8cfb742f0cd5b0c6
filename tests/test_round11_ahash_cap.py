"""Cap-boundary recall probe for the two-tier aHash incremental screen
(VERDICT r10 item 6): a planted near-dup pair whose band bucket
population STRADDLES ``hot_bucket_cap`` — including across micro-batches,
where deltas folding into the base push the bucket over the cap between
one screen and the next — must never be dropped by the tier decision.

Drives :func:`incremental_screen_from_band_tables` (the band-table seam
of ``ahash_incremental``) with CONTROLLED 64-bit band values, so the
planted pair's Hamming distance and its bucket's population are exact
inputs, and compares every capped run against the cap=inf (pure cold
tier) reference result set.
"""

from __future__ import annotations

import random

import pytest

# full-profile only (r16): scale-heavy suite moved out of the driver's
# default pytest budget; tools/run_suite.py (-m "") still runs it
pytestmark = pytest.mark.full
from hypothesis import given, settings
from hypothesis import strategies as st

from oic_options_chains_spark.operators.phash import (
    N_BANDS,
    incremental_screen_from_band_tables,
)

HOT_BAND = 0xBEEF  # the planted shared band-0 value (the bucket under test)
MAX_HAMMING = 3


def _flip_bits(bands: list[int], bits: list[int]) -> list[int]:
    out = list(bands)
    for k in bits:
        out[k // 16] ^= 1 << (k % 16)
    return out


def _rand_bands(rng: random.Random, fixed_band0: int | None = None) -> list[int]:
    b = [rng.randrange(1 << 16) for _ in range(N_BANDS)]
    if fixed_band0 is not None:
        b[0] = fixed_band0
    return b


def _table(spark, rows):
    return spark.createDataFrame(
        rows, "__id long, __bands array<bigint>"
    ).localCheckpoint(eager=True)


def _screen(spark, base_rows, delta_rows, cap):
    best = incremental_screen_from_band_tables(
        _table(spark, base_rows),
        _table(spark, delta_rows),
        max_hamming=MAX_HAMMING,
        hot_bucket_cap=cap,
    )
    return {(r.delta_id, r.base_id, r.hamming) for r in best.collect()}


def _corpus(seed: int, crowd: int, n_flips: int):
    """Base rows: ``crowd`` docs sharing band 0 (= the bucket whose
    population straddles the cap) + background docs off the bucket.
    Delta rows: the planted near-sibling of crowd member 0 (band 0
    kept identical; <= MAX_HAMMING bits flipped in bands 1..3) + one
    unrelated doc. Returns (base_rows, delta_rows, sibling_id)."""
    rng = random.Random(seed)
    base = [(i, _rand_bands(rng, HOT_BAND)) for i in range(crowd)]
    base += [(100 + i, _rand_bands(rng)) for i in range(4)]
    flips = rng.sample(range(16, 64), n_flips)  # never touch band 0
    sib = (1000, _flip_bits(base[0][1], flips))
    delta = [sib, (1001, _rand_bands(rng))]
    return base, delta, sib[0]


@settings(max_examples=8, deadline=None)
@given(
    seed=st.integers(0, 10**6),
    crowd=st.integers(3, 7),
    n_flips=st.integers(0, MAX_HAMMING),
)
def test_capped_screen_equals_uncapped_at_the_boundary(
    spark, seed, crowd, n_flips
):
    """For caps straddling the planted bucket's BASE population
    (crowd-1 -> hot tier engaged, crowd -> cold tier, crowd+1 -> cold),
    the screen's full result set equals the uncapped reference, and the
    planted pair is present in all of them."""
    base, delta, sib_id = _corpus(seed, crowd, n_flips)
    ref = _screen(spark, base, delta, 1 << 62)
    assert any(d == sib_id and b == 0 for d, b, _ in ref), (
        "planted sibling missing from the uncapped reference"
    )
    for cap in (crowd - 1, crowd, crowd + 1):
        assert _screen(spark, base, delta, cap) == ref, f"cap={cap}"


def test_bucket_crossing_the_cap_between_micro_batches(spark):
    """Micro-batch sequence: batch 1 screens while the bucket is AT the
    cap (cold tier); its survivors fold into the base, pushing the
    bucket OVER the cap, so batch 2's screen routes the same bucket
    through the hot tier. Both batches must match their uncapped
    references — the tier flip changes the join key shape, never the
    result."""
    cap = 4
    rng = random.Random(7)
    base = [(i, _rand_bands(rng, HOT_BAND)) for i in range(cap)]  # at cap
    # batch 1: two new crowd members (grow the bucket past the cap) +
    # a near-sibling of base doc 0
    b1_new = [(50, _rand_bands(rng, HOT_BAND)), (51, _rand_bands(rng, HOT_BAND))]
    b1_sib = (52, _flip_bits(base[0][1], [17, 40]))
    delta1 = b1_new + [b1_sib]
    assert _screen(spark, base, delta1, cap) == _screen(
        spark, base, delta1, 1 << 62
    )
    # fold batch 1 into the base: bucket now cap+3 > cap (hot in batch 2)
    base2 = base + delta1
    delta2 = [
        (60, _flip_bits(b1_new[0][1], [20])),  # sibling of a FOLDED doc
        (61, _flip_bits(base[1][1], [33, 48, 63])),  # sibling of an old doc
        (62, _rand_bands(rng)),  # unrelated
    ]
    got = _screen(spark, base2, delta2, cap)
    assert got == _screen(spark, base2, delta2, 1 << 62)
    matched = {d for d, _, _ in got}
    assert {60, 61} <= matched, "planted siblings dropped after the tier flip"


@pytest.mark.parametrize("cap", [0, 1, 2, 3])
def test_every_bucket_hot_still_exact(spark, cap):
    """Degenerate caps force every populated bucket through the hot
    tier; the sub-band pigeonhole alone must still find every pair."""
    base, delta, sib_id = _corpus(11, 5, MAX_HAMMING)
    ref = _screen(spark, base, delta, 1 << 62)
    assert _screen(spark, base, delta, cap) == ref
    assert any(d == sib_id for d, _, _ in ref)
