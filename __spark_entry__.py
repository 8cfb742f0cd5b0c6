"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``oic_options_chains_spark``; see SURVEY.md
section 2 for the operator inventory each query key represents.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The composite chain-build pipeline: as-of price -> decimal targets ->
    nearest expiry/strike selection -> side explode -> PK dedup
    (SURVEY.md section 3.2).
    """
    from oic_options_chains_spark.pipelines.chains import build_chain

    return build_chain(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    from oic_options_chains_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted keys get the weaker
    rows-only check)."""
    from oic_options_chains_spark.queries import ORACLE

    return dict(ORACLE)
