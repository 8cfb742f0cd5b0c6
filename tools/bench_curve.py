"""Scale-curve bench: the most expensive headline queries at sf0.1 /
sf0.5 / sf1, with a log-log slope per query.

The per-round driver bench (bench.py) pins sf0.1; this answers the
100 TB question directly: as the data grows 10x, does each plan's cost
grow linearly (slope ~1, scan-bound), sublinearly (slope <1, fixed
overheads still dominate at these sizes), or superlinearly (slope >1 —
a pair-explosion or shuffle blow-up that needs a plan fix or a
documented cap)? Slopes are fit on best-of-N timings between the
sf0.1 and sf1 points (10x row counts via tools/gen_scale.py).

Writes SCALE_CURVE.json and prints one JSON line per query.
Usage: python tools/bench_curve.py [--runs 3] [--queries q_a q_b ...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the 5 most expensive at sf0.1 in BENCH_r05 + the scale-shape-critical
# operator families (LSH pair generation, IVF probe, graph, interval/
# point-in-time range joins, packing, span dedup)
DEFAULT_QUERIES = [
    "q_ann_ivf_pq",
    "q_curation_build",
    "q_semdedup",
    "q_selection_build",
    "q_dsir_select",
    "q_ann_ivf_kmeans",
    "q_minhash_lsh_pairs",
    "q_simhash_pairs",
    "q_span_dedup",
    "q_knn_triangles",
    "q_chain_build",
    "q_pack_sequences",
    "q_interval_join",
    "q_pit_join",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--queries", nargs="+", default=DEFAULT_QUERIES)
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "SCALE_CURVE.json",
        ),
    )
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    points = [
        ("0.1", "/root/testdata/sf0.1"),
        ("0.5", os.path.join(repo, ".scale", "sf0.5")),
        ("1", os.path.join(repo, ".scale", "sf1")),
    ]
    for _, d in points:
        if not os.path.isdir(d):
            raise SystemExit(f"missing {d}; run tools/gen_scale.py first")

    from oic_options_chains_spark.queries import QUERIES
    from oic_options_chains_spark.session import get_spark

    spark = get_spark(app_name="oic-bench-curve")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q_group_count"](spark, points[0][1]).count()  # warm-up

    results: dict[str, dict] = {}
    for name in args.queries:
        fn = QUERIES[name]
        row: dict[str, float] = {}
        for sf, sf_dir in points:
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            row[sf] = round(best, 3)
        # log-log slope between the 10x-apart endpoints
        slope = math.log(row["1"] / row["0.1"]) / math.log(10.0)
        results[name] = {**row, "slope": round(slope, 2)}
        print(json.dumps({"query": name, **results[name]}), flush=True)

    with open(args.out, "w") as fh:
        json.dump(
            {
                "points_sf": [p[0] for p in points],
                "runs_per_point": args.runs,
                "queries": results,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
