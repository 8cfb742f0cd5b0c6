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
    "q_dedup_ensemble",
    "q_maxmatch_segment",
    "q_anf",
    "q_pit_join",
]


def _semdedup_scaled_k(spark, sf_dir):
    """The documented SemDeDup scale path: k grows with the corpus
    (cells stay bounded-size) instead of the oracle-pinned k=8. With
    k ~ sqrt(n) the within-cell pairing is O(n^1.5) and the fixed-k
    quadratic term disappears — the curve's job is to show the slope
    actually drops when the knob is turned."""
    from pyspark.sql import functions as F  # noqa: F401

    from oic_options_chains_spark.operators.kmeans import semantic_dedup
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    n = e.count()
    k = max(8, int(n**0.5))
    return semantic_dedup(e, eps=22_000_000, k=k, iters=2)


def _knn_triangles_scaled_bits(spark, sf_dir):
    """The documented kNN-graph scale path: sign-bucket bits sized by
    similarity.bits_for(n) (buckets stay ~target-rows) instead of the
    oracle-pinned bits=4."""
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.graph import (
        bucketed_knn_edges,
        mutual_edges,
        triangle_counts,
    )
    from oic_options_chains_spark.operators.similarity import bits_for
    from oic_options_chains_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    bits = bits_for(emb.count())
    edges = mutual_edges(
        bucketed_knn_edges(emb, k=6, bits=bits, broadcast_candidates=True)
    )
    return triangle_counts(edges).select(
        F.col("node").alias("vec_id"), "degree", "n_triangles"
    )


def _semdedup_sub_lsh(spark, sf_dir):
    """The VALIDATED SemDeDup scale knob: keep the cheap fixed-k fit,
    split each cell's pairing by a bits_for(n)-sized sign-LSH sub-bucket
    (semantic_dedup(sub_bits=...)). Pair groups stay bounded without
    pushing the Lloyd fit superlinear the way scaled_k does."""
    from oic_options_chains_spark.operators.kmeans import semantic_dedup
    from oic_options_chains_spark.operators.similarity import bits_for
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(
        e, eps=22_000_000, k=8, iters=2, sub_bits=bits_for(e.count())
    )


# scale-path variants of the fixed-parameter (oracle-checkable) queries:
# same operator, the at-scale knob turned the way its docstring says
SCALED_VARIANTS = {
    "q_semdedup@scaled_k": _semdedup_scaled_k,
    "q_semdedup@sub_lsh": _semdedup_sub_lsh,
    "q_knn_triangles@scaled_bits": _knn_triangles_scaled_bits,
}


def _materialize(df) -> None:
    """Force FULL computation of every output column. df.count() lets
    Catalyst prune projected expressions (a row-local rebuild times as
    a no-op); the noop sink computes all columns and discards rows."""
    df.write.format("noop").mode("overwrite").save()


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
    # all three points come from gen_scale.py's 32-part-file layout so
    # scan parallelism is CONSTANT across the curve — the driver's
    # single-row-group sf0.1 files are unsplittable (1 scan task), which
    # would fold a parallelism discontinuity into the slope
    points = [
        ("0.1", os.path.join(repo, ".scale", "sf0.1")),
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
    names = list(args.queries)
    if args.queries == DEFAULT_QUERIES:
        names += list(SCALED_VARIANTS)
    for name in names:
        fn = SCALED_VARIANTS.get(name) or QUERIES[name]
        row: dict[str, float] = {}
        for sf, sf_dir in points:
            best = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                _materialize(fn(spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            row[sf] = round(best, 3)
        # log-log slope between the 10x-apart endpoints
        slope = math.log(row["1"] / row["0.1"]) / math.log(10.0)
        results[name] = {**row, "slope": round(slope, 2)}
        print(json.dumps({"query": name, **results[name]}), flush=True)

    # merge with an existing curve file so targeted --queries runs extend
    # the recorded set instead of clobbering it
    merged = results
    if os.path.exists(args.out):
        try:
            with open(args.out) as fh:
                prev = json.load(fh).get("queries", {})
            merged = {**prev, **results}
        except (OSError, ValueError):
            pass
    with open(args.out, "w") as fh:
        json.dump(
            {
                "points_sf": [p[0] for p in points],
                "runs_per_point": args.runs,
                "queries": merged,
            },
            fh,
            indent=1,
            sort_keys=True,
        )
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
