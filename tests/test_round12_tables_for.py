"""similarity.tables_for — the closed-form (L, b) solver behind the
round-12 recall contract. Properties: the returned L actually reaches
the target on the S-curve, L-1 does not (minimality), monotonicity in
threshold and target, and the documented anchor points."""

from __future__ import annotations

import math

import pytest
from hypothesis import given
from hypothesis import strategies as st

from oic_options_chains_spark.operators.similarity import tables_for


def _recall(threshold: float, L: int, b: int) -> float:
    p = 1.0 - math.acos(threshold) / math.pi
    return 1.0 - (1.0 - p**b) ** L


def test_contract_anchor_points():
    # the round-12 contract: >= 9000 bp at cos >= 0.7 with b=8
    assert tables_for(0.7) == 23  # theory minimum; default 28 adds margin
    assert _recall(0.7, 23, 8) >= 0.9
    assert _recall(0.7, 22, 8) < 0.9
    # the shipped default comfortably covers the contract
    assert _recall(0.7, 28, 8) >= 0.94
    # near-exact pairs need a single table for any reasonable target
    # (true cos=1 dups are never lost at ANY L — they agree on every plane)
    assert tables_for(0.999999, 9900) == 1


@given(
    st.floats(min_value=0.35, max_value=0.99),
    st.integers(min_value=5000, max_value=9950),
    st.integers(min_value=4, max_value=12),
)
def test_returned_l_is_minimal_and_sufficient(threshold, target_bp, b):
    try:
        L = tables_for(threshold, target_bp, bits_per_table=b)
    except ValueError:
        return  # honestly unreachable targets raise — covered below
    assert _recall(threshold, L, b) >= target_bp / 10_000.0
    if L > 1:
        assert _recall(threshold, L - 1, b) < target_bp / 10_000.0


def test_monotone_in_threshold_and_target():
    assert tables_for(0.5) >= tables_for(0.7) >= tables_for(0.9)
    assert tables_for(0.7, 9900) >= tables_for(0.7, 9000) >= tables_for(0.7, 5000)


def test_unreachable_targets_raise_with_guidance():
    with pytest.raises(ValueError, match="exact or dense screen"):
        tables_for(0.05, 9900, bits_per_table=16)
    with pytest.raises(ValueError, match="threshold"):
        tables_for(1.5)
    with pytest.raises(ValueError, match="target_recall_bp"):
        tables_for(0.7, 10_000)
