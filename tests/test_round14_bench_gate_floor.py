"""Round 14 (VERDICT r13 item 2): the per-key bench gate divides raw
per-key times, so any <= 0.3 s key could trip 2x on scheduler jitter —
the r13 ledger's q_group_count/q_tumbling_window false-RED (gated at
2.28x/2.34x, re-measured fastest-ever 0.19/0.24 s an hour later, same
code). The fix floors the ratio DENOMINATOR at 0.5 s: a sub-second key
goes red only past max(2*base, 1.0 s), a genuine blowup; keys >= 0.5 s
gate exactly as before; the shared-key total ratio is unchanged.
"""

from __future__ import annotations

import json

from tools.bench_commit import PER_KEY_FLOOR_SEC, gate


def _gate_for(tmp_path, monkeypatch, base: dict, cur: dict) -> list[str]:
    (tmp_path / "BASELINE_BENCH.json").write_text(
        json.dumps({"queries": base})
    )
    detail = tmp_path / "BENCH_DETAIL.json"
    detail.write_text(json.dumps({"queries": cur}))
    import tools.bench_commit as bc

    monkeypatch.setattr(bc, "REPO", str(tmp_path))
    return gate(str(detail))


_PAD = {f"q_pad{i}": 1.0 for i in range(20)}  # >= 20-key coverage floor


def test_sub_second_jitter_no_longer_reds(tmp_path, monkeypatch):
    """The exact r13 false-RED shape: a 0.1 s baseline key measured at
    0.23 s (2.3x raw) stays green under the floor."""
    base = dict(_PAD, q_group_count=0.1)
    cur = dict(_PAD, q_group_count=0.23)
    assert _gate_for(tmp_path, monkeypatch, base, cur) == []


def test_sub_second_genuine_blowup_still_reds(tmp_path, monkeypatch):
    """A sub-second key past max(2*base, 2*floor) = 1.0 s is a real
    regression, not jitter — still red."""
    base = dict(_PAD, q_tiny=0.1)
    cur = dict(_PAD, q_tiny=1.2)
    problems = _gate_for(tmp_path, monkeypatch, base, cur)
    assert any("q_tiny" in p for p in problems), problems


def test_keys_at_or_above_floor_gate_exactly_as_before(tmp_path, monkeypatch):
    base = dict(_PAD, q_big=3.0)
    assert _gate_for(
        tmp_path, monkeypatch, base, dict(_PAD, q_big=5.9)
    ) == []
    problems = _gate_for(tmp_path, monkeypatch, base, dict(_PAD, q_big=6.1))
    assert any("q_big" in p for p in problems), problems


def test_total_ratio_gate_unfloored(tmp_path, monkeypatch):
    """Sub-second jitter averages out over the sum, so the total gate
    keeps raw times — and still reds on a uniform 1.6x slowdown."""
    base = {f"q{i}": 0.2 for i in range(25)}
    cur = {k: v * 1.6 for k, v in base.items()}
    problems = _gate_for(tmp_path, monkeypatch, base, cur)
    assert problems == [f"shared-key total ratio 1.60 > 1.5"]


def test_floor_constant_is_half_second():
    assert PER_KEY_FLOOR_SEC == 0.5
