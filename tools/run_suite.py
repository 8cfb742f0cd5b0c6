"""Sharded full-suite runner: the full pytest profile in a fraction of
the wall-clock by running K pytest subprocesses over disjoint test-file
shards, each with its own SparkSession JVM on a slice of the CPUs.

Why not pytest-xdist: not installed in the container (installs are
prohibited). A process-per-shard runner gets the same wall-time win —
each shard's session-scoped Spark fixture lives in its own JVM, and
SPARK_GRAFT_CPUS divides the cores so shards don't thrash each other.

Shards are balanced greedily by per-FILE durations recorded from a
previous full run (tools/suite_durations.json, refreshed with
--record); unknown files fall back to a size-based estimate. The three
parity gates are the longest files, so duration-balancing is what
actually makes the shards even.

Usage:
    python tools/run_suite.py [--shards 4] [--record] [pytest-args...]
Exit code: 0 iff every shard passed. Per-shard tails are printed on
failure; full logs land in .suite_shard_<i>.log.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DUR_PATH = os.path.join(REPO, "tools", "suite_durations.json")


def _load_durations() -> dict[str, float]:
    try:
        with open(DUR_PATH) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _estimate(path: str, recorded: dict[str, float]) -> float:
    name = os.path.basename(path)
    if name in recorded:
        return recorded[name]
    # unknown file: assume ~1s per KB of test code (empirically the
    # right order for this suite's Spark-fixture tests)
    return max(1.0, os.path.getsize(path) / 1024.0)


def _shard(files: list[str], k: int, recorded: dict[str, float]) -> list[list[str]]:
    """Greedy longest-processing-time assignment."""
    sized = sorted(files, key=lambda p: -_estimate(p, recorded))
    shards: list[list[str]] = [[] for _ in range(k)]
    loads = [0.0] * k
    for path in sized:
        i = loads.index(min(loads))
        shards[i].append(path)
        loads[i] += _estimate(path, recorded)
    return [s for s in shards if s]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=4)
    ap.add_argument(
        "--record",
        action="store_true",
        help="refresh tools/suite_durations.json from this run's timings",
    )
    args, passthrough = ap.parse_known_args()

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    recorded = _load_durations()
    shards = _shard(files, args.shards, recorded)
    cpus_total = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    cpus_per = max(2, cpus_total // max(len(shards), 1))

    procs = []
    t0 = time.monotonic()
    for i, shard in enumerate(shards):
        env = dict(os.environ)
        env["SPARK_GRAFT_CPUS"] = str(cpus_per)
        # REPO on the import path: each shard runs from its own cwd (so
        # concurrent JVMs don't fight over metastore_db/derby.log —
        # saveAsTable tests create both in the working directory), and
        # absolute test paths + PYTHONPATH make discovery cwd-free
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        shard_tmp = os.path.join(REPO, f".suite_shard_{i}")
        os.makedirs(shard_tmp, exist_ok=True)
        log = open(os.path.join(REPO, f".suite_shard_{i}.log"), "w")
        cmd = [
            sys.executable,
            "-m",
            "pytest",
            *shard,
            "-q",
            "--durations=0",
            "-p",
            "no:cacheprovider",
            f"--rootdir={REPO}",
            # the COMPLETE profile: override pytest.ini's default
            # `-m "not full"` (the driver-budget fast profile, r16) —
            # an explicit -m in passthrough still wins (last -m counts)
            "-m",
            "",
            *passthrough,
        ]
        procs.append(
            (
                i,
                shard,
                log,
                subprocess.Popen(
                    cmd, cwd=shard_tmp, env=env, stdout=log, stderr=subprocess.STDOUT
                ),
            )
        )

    failed = []
    for i, shard, log, p in procs:
        rc = p.wait()
        log.close()
        status = "ok" if rc == 0 else f"FAILED rc={rc}"
        print(f"shard {i}: {len(shard)} files, {status}")
        if rc != 0:
            failed.append(i)
    wall = time.monotonic() - t0
    print(f"suite wall-time: {wall:.0f}s across {len(shards)} shards")

    if args.record and not failed:
        new: dict[str, float] = {}
        for i, _, _, _ in procs:
            with open(os.path.join(REPO, f".suite_shard_{i}.log")) as f:
                for line in f:
                    # pytest --durations=0 lines: "1.23s call     tests/test_x.py::test_y"
                    parts = line.split()
                    if (
                        len(parts) == 3
                        and parts[0].endswith("s")
                        and parts[1] in ("call", "setup", "teardown")
                    ):
                        try:
                            dur = float(parts[0][:-1])
                        except ValueError:
                            continue
                        fname = os.path.basename(parts[2].split("::")[0])
                        new[fname] = new.get(fname, 0.0) + dur
        if new:
            with open(DUR_PATH, "w") as f:
                json.dump(new, f, indent=1, sort_keys=True)
            print(f"recorded durations for {len(new)} files -> {DUR_PATH}")

    if failed:
        for i in failed:
            print(f"--- shard {i} tail ---")
            with open(os.path.join(REPO, f".suite_shard_{i}.log")) as f:
                print("".join(f.readlines()[-30:]))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
