"""Command-line entry point — the operational face of the engine, the
analog of the reference's shell wrappers (extract-transform-load.sh,
dump-dolt.rkt's CLI flags): run any registered query by name against a
data directory, list the inventory, or print a query's DuckDB oracle.

    python -m oic_options_chains_spark list
    python -m oic_options_chains_spark run q_chain_build \
        --sf-dir /root/testdata/sf0.01 --limit 20
    python -m oic_options_chains_spark oracle q_chain_build

``run`` prints row count and (with --limit) the first rows; --explain
prints the executed plan instead of collecting (the tuning loop).
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="oic_options_chains_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries")

    runp = sub.add_parser("run", help="run a registered query")
    runp.add_argument("query")
    runp.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    runp.add_argument("--limit", type=int, default=0, help="print first N rows")
    runp.add_argument(
        "--explain", action="store_true", help="print the physical plan only"
    )

    orp = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orp.add_argument("query")

    args = p.parse_args(argv)

    from oic_options_chains_spark.queries import ORACLE, QUERIES

    if args.cmd == "list":
        for name in sorted(QUERIES):
            marker = "oracle" if name in ORACLE else "rows-only"
            print(f"{name}\t{marker}")
        return 0

    if args.query not in QUERIES:
        print(f"unknown query {args.query!r}; see 'list'", file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        if args.query not in ORACLE:
            print(f"{args.query} has no SQL oracle", file=sys.stderr)
            return 1
        print(ORACLE[args.query].strip())
        return 0

    from oic_options_chains_spark.session import get_spark

    spark = get_spark(app_name=f"cli-{args.query}")
    spark.sparkContext.setLogLevel("ERROR")
    df = QUERIES[args.query](spark, args.sf_dir)
    if args.explain:
        print(df._jdf.queryExecution().executedPlan().toString())
        return 0
    n = df.count()
    print(f"{args.query}: {n} rows")
    if args.limit > 0:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
