"""Quiet-box tiebreak re-record (VERDICT r10 item 4): min-of-N timings
for a named set of bench keys at the driver SF, printed as one JSON
line for SCALING.md. Run on an otherwise-idle box — the point is to
separate ambient host noise from real regressions when round-over-round
bench totals move with no code change to the keys that moved.

Usage: python tools/requiet.py [--runs 3] [--sf-dir /root/testdata/sf0.1] q_a q_b ...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from oic_options_chains_spark.queries import QUERIES
    from oic_options_chains_spark.session import get_spark

    spark = get_spark(app_name="oic-requiet")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q_group_count"](spark, args.sf_dir).count()  # JVM warm-up

    out: dict[str, float] = {}
    for name in args.queries:
        fn = QUERIES[name]
        fn(spark, args.sf_dir).count()  # per-query codegen warm-up
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s", file=sys.stderr)
    print(json.dumps({"sf_dir": args.sf_dir, "runs": args.runs, "queries": out}))


if __name__ == "__main__":
    main()
