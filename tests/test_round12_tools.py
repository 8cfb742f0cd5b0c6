"""tools/bench_commit.py gate: same bounds as the repo's committed-record
gate — green on the committed BENCH_DETAIL.json, red on a fabricated
regression. Keeps the atomic refresh tool honest without running bench."""

from __future__ import annotations

import json
import os

from tools.bench_commit import REPO, gate


def test_gate_green_on_committed_record():
    assert gate(os.path.join(REPO, "BENCH_DETAIL.json")) == []


def test_gate_flags_fabricated_regressions(tmp_path):
    with open(os.path.join(REPO, "BASELINE_BENCH.json")) as fh:
        base = json.load(fh)["queries"]
    bad = {k: v * 3 for k, v in base.items()}  # every key past 2x
    p = tmp_path / "detail.json"
    p.write_text(json.dumps({"queries": bad}))
    problems = gate(str(p))
    assert any("2x baseline" in m for m in problems)
    assert any("total ratio" in m for m in problems)


def test_gate_flags_missing_baseline_coverage(tmp_path):
    with open(os.path.join(REPO, "BASELINE_BENCH.json")) as fh:
        base = json.load(fh)["queries"]
    few = dict(list(base.items())[:3])  # under the 20-key floor
    p = tmp_path / "detail.json"
    p.write_text(json.dumps({"queries": few}))
    assert any("baseline keys" in m for m in gate(str(p)))
