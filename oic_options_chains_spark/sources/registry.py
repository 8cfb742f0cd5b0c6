"""Loaders for the synthetic benchmark tables (TESTDATA.md).

Plain parquet scans — column pruning and predicate pushdown are then free
for every downstream query. No caching here: each query declares its own
plan and AQE handles reuse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    assert name in TABLES, f"unknown table {name}"
    if name == "events":
        # Some generator versions write events.ts as parquet TIMESTAMP(NANOS),
        # which the vectorized reader rejects; read nanos as long and
        # integer-divide to microseconds (double division would lose precision
        # on ~1.7e18 nanos). Other versions write TIMESTAMP(MICROS) without
        # isAdjustedToUTC, which arrives as TIMESTAMP_NTZ — cast to TIMESTAMP
        # (session tz is pinned UTC in session.py, so the cast is wall-clock
        # identical) so downstream unix_micros()/window() calls resolve.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        dt = df.schema["ts"].dataType
        if isinstance(dt, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(dt, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def table_row_count(
    sf_dir: str, name: str, spark: SparkSession | None = None
) -> int:
    """Row count straight from the parquet FOOTERS — a driver-side
    metadata read (pyarrow), zero Spark jobs. This is what sizing
    decisions (LSH bit widths, bucket targets) should consume at query
    CONSTRUCTION time: a ``df.count()`` there launches a full job before
    the query even runs and makes the builder eagerly non-lazy, which at
    100 TB is an extra pass over the corpus per invocation. Footer stats
    are exact for parquet (every row group records num_rows).

    Non-local ``sf_dir`` (s3://, hdfs://, ...): footers are read through
    ``pyarrow.fs.FileSystem.from_uri`` when a binding for the scheme is
    installed; otherwise the count falls back to a Spark job over the
    table (exact, but one extra pass — pass ``spark`` to enable it, or
    the call raises rather than crashing mid-os.walk)."""
    assert name in TABLES, f"unknown table {name}"
    import os
    from urllib.parse import unquote, urlsplit

    import pyarrow.parquet as pq

    path = f"{sf_dir}/{name}.parquet"
    # Normalize the scheme ONCE: urlsplit handles every local spelling —
    # plain /p, file:///p, Spark-canonical single-slash file:/p, and any
    # case of the scheme (FILE://) — where an ad-hoc startswith("file://")
    # strip missed the last two.  A file URI with a non-local authority
    # falls through to the pyarrow-filesystem branch.
    parts = urlsplit(path)
    scheme = parts.scheme.lower()
    if (scheme in ("", "file") and parts.netloc in ("", "localhost")) or (
        # windows-style drive letters parse as a 1-char "scheme"
        len(parts.scheme) == 1
    ):
        lpath = path if scheme != "file" else unquote(parts.path)
        if os.path.isdir(lpath):
            total = 0
            for root, _dirs, files in os.walk(lpath):
                for f in files:
                    if f.endswith(".parquet"):
                        total += pq.ParquetFile(
                            os.path.join(root, f)
                        ).metadata.num_rows
            return total
        return pq.ParquetFile(lpath).metadata.num_rows
    try:
        import pyarrow.dataset as pads
        from pyarrow import fs as pafs

        filesystem, fs_path = pafs.FileSystem.from_uri(path)
        return pads.dataset(
            fs_path, filesystem=filesystem, format="parquet"
        ).count_rows()
    except Exception as exc:  # noqa: BLE001 — no binding for the scheme
        if spark is not None:
            return load_table(spark, sf_dir, name).count()
        raise ValueError(
            f"table_row_count: no pyarrow filesystem binding for {sf_dir!r} "
            f"({exc}); pass spark= to fall back to a Spark-side count"
        ) from exc


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every benchmark table as a temp view so the whole engine
    is drivable from ``spark.sql`` — the SQL face of the API (the same
    table names the DuckDB oracles use, so a query's oracle SQL is
    usually runnable on Spark verbatim). Views are lazy scans: pruning
    and pushdown still reach the parquet."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
