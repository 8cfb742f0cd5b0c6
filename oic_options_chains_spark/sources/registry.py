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
