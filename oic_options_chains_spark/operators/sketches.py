"""Distinct-count sketching: KMV (k minimum values).

``approx_count_distinct`` (HLL) is the built-in, but its estimate is
implementation-defined — unusable where two engines (or two runs of a
changing implementation) must agree. KMV is the deterministic
alternative: hash every distinct value to a uniform fraction, keep the k
smallest; the k-th smallest fraction m estimates the distinct count as
(k-1)/m. Everything is md5-derived, so ANY engine computes the
bit-identical sketch and estimate.

Determinism details that matter cross-engine:
- The fraction is the first 13 md5 hex chars (52 bits) over 2^52 — the
  numerator fits a double's mantissa exactly and the denominator is a
  power of two, so the division is EXACT in IEEE754, not approximately
  equal across engines.
- The estimate divides two exact doubles and floors — identical
  operation order everywhere.

Scale notes: the k-minima come from a global sort-limit, which Spark
plans as TakeOrderedAndProject — per-partition top-k then a k-sized
merge on one reducer; no full sort, no full shuffle. Sketches are
mergeable (union the minima lists, re-take k smallest), which is what
makes them partition-parallel at 100 TB: sketch per partition/day, merge
for any rollup window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_POW_52 = float(2**52)


def hash_fraction(col: Column) -> Column:
    """Uniform [0,1) fraction from md5 of the value's string form; exact
    in double precision on every engine."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast("double")
        / F.lit(TWO_POW_52)
    )


def kmv_minima(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """The sketch itself: the k smallest hash fractions of the distinct
    values (fewer rows iff the true distinct count is below k). Two
    sketches merge by union + re-limit — associative and deterministic."""
    return (
        df.select(F.col(col))
        .distinct()
        .select(hash_fraction(F.col(col)).alias("f"))
        .orderBy("f")
        .limit(k)
    )


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """One row: (n_minima, estimate). Below saturation the sketch has
    seen every distinct value and the estimate IS the exact count; at
    saturation the k-th minimum m gives floor((k-1)/m)."""
    agg = kmv_minima(df, col, k).agg(
        F.count(F.lit(1)).alias("n_minima"), F.max("f").alias("__m")
    )
    return agg.select(
        F.col("n_minima").cast("bigint").alias("n_minima"),
        F.when(F.col("n_minima") < k, F.col("n_minima"))
        .otherwise(F.floor(F.lit(float(k - 1)) / F.col("__m")))
        .cast("bigint")
        .alias("estimate"),
    )
