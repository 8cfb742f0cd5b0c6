"""Grouped ordinary-least-squares trend lines from integer moments —
drift detection over grouped time series (metric drift per source,
quality drift per shard, value trend per event class) as ONE aggregate.

The closed-form slope num/den with

    num = n*Sxy - Sx*Sy        den = n*Sxx - Sx*Sx   (>= 0)

needs only the five power sums (n, Sx, Sy, Sxy, Sxx), which are plain
integer sums when x and y are integers — order-independent, partition-
independent, and identical on every engine. Callers pass x already
integerized (days since an epoch, a version number) and y floor-scaled
(micro-units); the slope and intercept come out floor-scaled the same
way.

Exactness: sums run in decimal(38,0) (Sxx passes int64 at ~1e5 rows of
day-scale x), and the two divisions are integral ``div`` — Spark's div
and DuckDB's // BOTH truncate toward zero, including negatives, so the
emitted slope/intercept match bit-for-bit. den = 0 (all x equal within
a group) yields NULL slope/intercept on both engines.

Scale: one map-side-combined groupBy — the minimum possible work for a
grouped regression; no window, no join, no second pass. 100 TB of
events reduce to one row of moments per group."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def group_linear_trend(
    df: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
) -> DataFrame:
    """(grp, n, slope, intercept, den): integer OLS per group.

    ``x`` and ``y`` must be integral columns (cast/floor upstream —
    the caller owns the scaling and therefore the units of the output:
    slope is y-units per x-unit, truncated toward zero; intercept is
    y-units at x = 0). ``den`` is emitted for diagnostics: n*var(x),
    zero when the group has a single distinct x (slope NULL)."""
    m = df.select(
        F.col(group_col).alias("grp"),
        x.cast("bigint").alias("__x"),
        y.cast("bigint").alias("__y"),
    ).groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(_dec(F.col("__x"))).alias("sx"),
        F.sum(_dec(F.col("__y"))).alias("sy"),
        F.sum(_dec(F.col("__x")) * _dec(F.col("__y"))).alias("sxy"),
        F.sum(_dec(F.col("__x")) * _dec(F.col("__x"))).alias("sxx"),
    )
    num = _dec(F.col("n")) * F.col("sxy") - F.col("sx") * F.col("sy")
    den = _dec(F.col("n")) * F.col("sxx") - F.col("sx") * F.col("sx")
    with_nd = m.select(
        "grp", "n", "sx", "sy", num.alias("num"), den.alias("den")
    )
    # slope = num div den; intercept = (Sy*den - num*Sx) div (n*den) —
    # both integral truncations both engines share. Guard den = 0.
    return with_nd.selectExpr(
        "grp",
        "n",
        "CASE WHEN den = 0 THEN NULL"
        " ELSE CAST(num div den AS BIGINT) END AS slope",
        "CASE WHEN den = 0 THEN NULL"
        " ELSE CAST((sy * den - num * sx) div"
        " (CAST(n AS DECIMAL(38,0)) * den) AS BIGINT) END AS intercept",
        "CAST(den AS DECIMAL(38,0)) AS __den",
    ).select(
        "grp",
        "n",
        "slope",
        "intercept",
        F.col("__den").cast("string").alias("den"),
    )
