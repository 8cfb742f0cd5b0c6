"""Registration plumbing for the t2 query/oracle pairs."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its DuckDB oracle SQL.

    Queries without an oracle are non-SQL-expressible (streaming, UDF
    kernels); the driver records a rows-only check for those.
    """

    def deco(fn: QueryFn) -> QueryFn:
        assert name not in QUERIES, f"duplicate query {name}"
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
