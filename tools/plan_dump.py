"""Dump `.explain("formatted")` for named registry queries to files.

Optimization-round deliverable helper: writes
``plans/<tag>/<query>_<suffix>.txt`` (final plan plus every captured
pre-checkpoint stage, same full-lineage coverage as tools/plan_audit.py)
so plan claims in OPTIMIZATION_*.md are checkable without running Spark.

    python tools/plan_dump.py --tag r15 --suffix before q_a q_b ...
    python tools/plan_dump.py --tag r15 --suffix before --headline
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def formatted_plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r15")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--headline", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from oic_options_chains_spark.lineage import capture_checkpoints
    from oic_options_chains_spark.queries import QUERIES
    from oic_options_chains_spark.session import get_spark

    names = list(args.queries)
    if args.headline:
        import bench

        names.extend(k for k in bench.HEADLINE if k not in names)

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="oic-plan-dump", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        with capture_checkpoints() as stages:
            df = QUERIES[name](spark, SF_DIR)
        parts = [f"== {name} ({args.suffix}, sf_dir={SF_DIR}) ==\n"]
        for i, st in enumerate(stages):
            parts.append(
                f"\n-- checkpoint stage {i + 1}/{len(stages)} "
                f"(cut at {st.site}) --\n"
            )
            parts.append(formatted_plan(spark, st.df))
        parts.append("\n-- final plan --\n")
        parts.append(formatted_plan(spark, df))
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write("".join(parts))
        print(f"wrote {path}", file=sys.stderr)

    spark.stop()


if __name__ == "__main__":
    main()
