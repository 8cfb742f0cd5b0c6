"""JVM-side literal DataFrames.

``spark.createDataFrame`` over Python objects produces a Python-RDD-backed
plan (``applySchemaToPythonRDD``) whose evaluation spins up Python workers —
seconds of dead time inside otherwise all-JVM queries, and a per-task cost
at cluster scale. Literal tables (nearest-selection targets, strike
multipliers) must instead be ``explode(array(lit(...)))`` over a one-row
range: pure Catalyst, broadcastable for free, constant-folded.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def values_df(
    spark: SparkSession, name: str, values: Iterable, dtype: str
) -> DataFrame:
    """One-column literal DataFrame with a pinned type, built JVM-side."""
    arr = F.array(*[F.lit(v).cast(dtype) for v in values])
    return spark.range(1).select(F.explode(arr).alias(name))
