"""JDBC table source (SURVEY.md S4): the reference's universe and as-of
queries run against live Postgres (reference: extract.2023-11-16.rkt:126-161;
extract.rkt:73-108); this is the Spark-side reader they map onto.

Scale notes:
- A JDBC scan with no partitioning options is ONE task reading the whole
  table through one connection — fine for dimensions (the reference's
  holdings/lookup tables are kilobytes), wrong for facts. ``jdbc_options``
  therefore only emits the 4-tuple (partitionColumn/lowerBound/upperBound/
  numPartitions) when ALL are provided, and callers loading anything
  non-tiny must provide them.
- Spark pushes filters and column pruning into the remote query for plain
  table reads (the WHERE clause travels to the DB), so declare filters on
  the returned DataFrame rather than baking them into ``dbtable``.
- ``fetchsize`` defaults well above the JDBC drivers' row-at-a-time
  default (the reference's row-at-a-time INSERT loop is the exact
  anti-pattern this avoids on the read side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCHSIZE = 10_000


def jdbc_options(
    url: str,
    table: str,
    user: str | None = None,
    password: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | str | None = None,
    upper_bound: int | str | None = None,
    num_partitions: int | None = None,
    fetchsize: int = DEFAULT_FETCHSIZE,
) -> dict[str, str]:
    """Build the option map for ``spark.read.format("jdbc")``.

    Partitioning options are all-or-nothing: Spark requires the full
    4-tuple, and emitting a partial set is a confusing runtime error —
    so this raises early instead.
    """
    opts: dict[str, str] = {
        "url": url,
        "dbtable": table,
        "fetchsize": str(fetchsize),
    }
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    part = (partition_column, lower_bound, upper_bound, num_partitions)
    given = [p is not None for p in part]
    if any(given):
        if not all(given):
            raise ValueError(
                "partition_column, lower_bound, upper_bound and "
                "num_partitions must be provided together"
            )
        opts["partitionColumn"] = str(partition_column)
        opts["lowerBound"] = str(lower_bound)
        opts["upperBound"] = str(upper_bound)
        opts["numPartitions"] = str(num_partitions)
    return opts


def read_jdbc(spark: SparkSession, url: str, table: str, **kwargs) -> DataFrame:
    """Read a JDBC table as a DataFrame (thin over the built-in source)."""
    return spark.read.format("jdbc").options(**jdbc_options(url, table, **kwargs)).load()


def jdbc_or_registered(
    spark: SparkSession,
    table: str,
    jdbc_url: str | None = None,
    registered: DataFrame | None = None,
    **kwargs,
) -> DataFrame:
    """The deploy/test seam: a live ``spark.read.jdbc`` scan when a URL is
    configured, the caller's registered DataFrame otherwise (how every
    pipeline here is unit-tested — no database ships in CI)."""
    if jdbc_url:
        return read_jdbc(spark, jdbc_url, table, **kwargs)
    if registered is None:
        raise ValueError(f"no JDBC url and no registered DataFrame for {table!r}")
    return registered
