"""Atomic bench refresh: run bench.py, gate the FRESH record against
BASELINE_BENCH.json, and commit BENCH_DETAIL.json in the same step.

Closes the recurring r10/r11 process gap where the committed (gated)
BENCH_DETAIL.json trailed the working tree by one refresh: the gate in
tests/test_plans.py::test_committed_bench_stays_within_baseline_contract
audits the COMMITTED file, so any bench re-record that is not committed
immediately leaves the shipped record stale. This tool makes
refresh -> gate -> commit one command:

    python tools/bench_commit.py [--sf-dir /root/testdata/sf0.1]

Behavior:
- refuses to run if anything OTHER than BENCH_DETAIL.json is dirty
  (a bench record must sit on top of committed code, or the record and
  the commit it lands in describe different engines);
- runs bench.py as a subprocess (same interpreter), capturing the
  one-line JSON from stdout;
- applies the SAME bounds as the repo gate (per-key <= 2x baseline,
  shared-key total <= 1.5x) to the fresh BENCH_DETAIL.json;
- on green: git add BENCH_DETAIL.json && git commit;
- on red: leaves the record in the working tree (for diagnosis) and
  exits 1 WITHOUT committing.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", REPO, *args], check=True, capture_output=True, text=True
    ).stdout


# per-key ratio denominator floor, seconds (VERDICT r13 item 2): the
# box swings 1.5-2.5x on scheduling-bound sub-second keys within one
# day (r13 ledger: q_group_count gated RED at 2.28x, re-measured
# fastest-ever 0.19 s an hour later, same code), so raw division of a
# 0.2 s key trips the 2x gate on pure jitter. Flooring the DENOMINATOR
# at 0.5 s means a sub-second key must exceed max(2*base, 1.0 s) to go
# red — still catching any genuine blowup — while keys >= 0.5 s gate
# exactly as before. The total ratio stays unfloored: jitter averages
# out over the shared-key sum.
PER_KEY_FLOOR_SEC = 0.5


def gate(detail_path: str, notes: list[str] | None = None) -> list[str]:
    """THE bench gate (single definition): per-key <= 2x baseline (with
    the denominator floored at PER_KEY_FLOOR_SEC for sub-second keys),
    shared-key total <= 1.5x, >= 20 baseline keys covered. Used by this
    tool pre-commit AND delegated to by tests/test_plans.py::
    test_committed_bench_stays_within_baseline_contract, so the
    pre-commit check and the repo gate cannot drift (ADVICE r12).
    Returns a list of violations (empty = green). A zero-time baseline
    key (can't be ratioed) is excluded from the ratio set but still
    counts as missing coverage via the >= 20 floor.

    Violation messages carry the RAW cur/base ratio next to the floored
    one, and a sub-second key whose raw ratio exceeds 2x while the
    floored gate passes is appended to ``notes`` (non-fatal) — so the
    floor never hides what it is absorbing, only the red/green decision
    uses it (ADVICE r14)."""
    with open(os.path.join(REPO, "BASELINE_BENCH.json")) as fh:
        base = json.load(fh).get("queries", {})
    with open(detail_path) as fh:
        cur = json.load(fh).get("queries", {})
    common = [k for k in cur if k in base and base[k] > 0]
    problems = []
    if len(common) < 20:
        problems.append(f"only {len(common)} baseline keys benched (need 20)")
        if not common:  # nothing to ratio against — report, don't crash
            return problems
    over = {
        k: (
            f"{cur[k] / max(base[k], PER_KEY_FLOOR_SEC):.2f}x"
            f" (raw {cur[k] / base[k]:.2f}x)"
        )
        for k in common
        if cur[k] > 2 * max(base[k], PER_KEY_FLOOR_SEC)
    }
    if over:
        problems.append(f"queries past 2x baseline: {over}")
    if notes is not None:
        drift = {
            k: f"raw {cur[k] / base[k]:.2f}x (floored gate green)"
            for k in common
            if cur[k] > 2 * base[k]
            and cur[k] <= 2 * max(base[k], PER_KEY_FLOOR_SEC)
        }
        if drift:
            notes.append(f"sub-second keys past 2x raw (non-fatal): {drift}")
    total = sum(cur[k] for k in common) / sum(base[k] for k in common)
    if total > 1.5:
        problems.append(f"shared-key total ratio {total:.2f} > 1.5")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--message",
        default="Refresh BENCH_DETAIL.json (atomic bench_commit run)",
    )
    args = ap.parse_args()

    dirty = [
        line[3:]
        for line in _git("status", "--porcelain").splitlines()
        if line.strip() and line[3:] != "BENCH_DETAIL.json"
    ]
    if dirty:
        print(
            "refusing: working tree has non-bench changes — commit them "
            f"first so the record describes committed code: {dirty}",
            file=sys.stderr,
        )
        return 2

    # commit mode: bench.py writes the gated record to BENCH_DETAIL.json;
    # any other invocation (the driver's per-round run, local iteration)
    # writes the gitignored BENCH_DETAIL.run.json instead, so the two
    # records never fight over one path (VERDICT r12 item 3)
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=args.sf_dir,
        SPARK_GRAFT_BENCH_RECORD="commit",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    sys.stderr.write(proc.stderr[-2000:])
    if proc.returncode != 0:
        print(f"bench.py failed (exit {proc.returncode})", file=sys.stderr)
        return 1
    out_lines = proc.stdout.strip().splitlines()
    print(out_lines[-1] if out_lines else "(bench.py produced no stdout)")

    detail = os.path.join(REPO, "BENCH_DETAIL.json")
    notes: list[str] = []
    problems = gate(detail, notes=notes)
    for n in notes:
        print(f"note: {n}")
    if problems:
        print(
            "gate RED — record left uncommitted for diagnosis:\n  "
            + "\n  ".join(problems),
            file=sys.stderr,
        )
        return 1

    _git("add", "BENCH_DETAIL.json")
    if not _git("status", "--porcelain", "BENCH_DETAIL.json").strip():
        print("record unchanged — nothing to commit")
        return 0
    _git("commit", "-m", args.message)
    print("gate green — BENCH_DETAIL.json committed:")
    print(_git("log", "--oneline", "-1").strip())
    return 0


if __name__ == "__main__":
    sys.exit(main())
