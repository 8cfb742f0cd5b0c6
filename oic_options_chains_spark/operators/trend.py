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

from pyspark.sql import Column, DataFrame, Window
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


def group_changepoint(
    daily: DataFrame,
    group_col: str,
    x: Column,
    y: Column,
) -> DataFrame:
    """Single-changepoint detection per group: the split of the ordered
    (x, y) series minimizing the two-segment sum of squared errors —
    "when did this source's metric shift". Input is one row per (group,
    x) — aggregate to that grain upstream (daily totals, shard means).

    Exact arithmetic end to end: with prefix sums (n1, Sy1, Syy1) and
    totals, the two-segment SSE at split j is the rational N_j / (n1*n2)
    with N_j = Syy_tot*n1*n2 - Sy1^2*n2 - Sy2^2*n1 (all decimal(38,0)),
    and split A beats B iff N_A*d_B < N_B*d_A — the same cross-
    multiplied count-ahead-zero argmin the IVF probe ranking uses, ties
    to the earlier split. No double ever decides the split.

    Scale shape: the series is already aggregated to the (group, x)
    grain, so every window/join here touches #groups * #x rows — days,
    not events; the candidate self-join is per-group and bounded by the
    series length. Returns (grp, split_x, n_left, n_right, mean_left,
    mean_right) with means as truncated integer division of the y sums
    (the shared cross-engine definition)."""
    w = Window.partitionBy("grp").orderBy("x")
    pts = (
        daily.select(
            F.col(group_col).alias("grp"),
            x.cast("bigint").alias("x"),
            y.cast("bigint").alias("y"),
        )
        .withColumn("n1", F.row_number().over(w).cast("bigint"))
        .withColumn("sy1", F.sum(_dec(F.col("y"))).over(w))
        .withColumn("syy1", F.sum(_dec(F.col("y")) * _dec(F.col("y"))).over(w))
    )
    tot = pts.groupBy("grp").agg(
        F.max("n1").alias("m"),
        F.max_by("sy1", "n1").alias("sy_tot"),
        F.max_by("syy1", "n1").alias("syy_tot"),
    )
    cand = (
        pts.join(tot, "grp")
        .filter(F.col("n1") < F.col("m"))
        .select(
            "grp",
            F.col("x").alias("split_x"),
            "n1",
            (F.col("m") - F.col("n1")).alias("n2"),
            "sy1",
            (F.col("sy_tot") - F.col("sy1")).alias("sy2"),
            (
                F.col("syy_tot") * _dec(F.col("n1")) * _dec(F.col("m") - F.col("n1"))
                - F.col("sy1") * F.col("sy1") * _dec(F.col("m") - F.col("n1"))
                - (F.col("sy_tot") - F.col("sy1"))
                * (F.col("sy_tot") - F.col("sy1"))
                * _dec(F.col("n1"))
            ).alias("num"),
            (_dec(F.col("n1")) * _dec(F.col("m") - F.col("n1"))).alias("den"),
        )
    )
    l = cand.alias("l")
    r = cand.alias("r")
    ahead = (
        l.join(r, "grp")
        .select(
            "grp",
            F.col("l.split_x").alias("split_x"),
            F.when(
                (F.col("r.num") * F.col("l.den") < F.col("l.num") * F.col("r.den"))
                | (
                    (F.col("r.num") * F.col("l.den") == F.col("l.num") * F.col("r.den"))
                    & (F.col("r.split_x") < F.col("l.split_x"))
                ),
                1,
            )
            .otherwise(0)
            .alias("beat"),
        )
        .groupBy("grp", "split_x")
        .agg(F.sum("beat").alias("n_ahead"))
        .filter(F.col("n_ahead") == 0)
        .select("grp", "split_x")
    )
    return ahead.join(cand, ["grp", "split_x"]).select(
        "grp",
        "split_x",
        F.col("n1").alias("n_left"),
        F.col("n2").alias("n_right"),
        F.expr("CAST(sy1 div CAST(n1 AS DECIMAL(38,0)) AS BIGINT)").alias("mean_left"),
        F.expr("CAST(sy2 div CAST(n2 AS DECIMAL(38,0)) AS BIGINT)").alias("mean_right"),
    )


def gap_fill_ffill(
    df: DataFrame,
    group_col: str,
    date_col: str,
    value_col: str,
) -> DataFrame:
    """Calendar densification + forward fill: emit one row per group per
    DAY between that group's first and last observation, carrying the
    last observed value across the gaps — the resample step every
    daily-series consumer (trend fits, changepoint scans, drift windows)
    wants to run on a gapless axis.

    (group, day, value, is_observed): value is the observation when one
    exists, else the most recent prior observation (never NULL — the
    calendar starts AT the first observation). is_observed flags carried
    rows so downstream can weight them.

    Scale shape: bounds are a per-group min/max aggregate (group-keyed,
    map-side combined); the calendar explodes row-locally from
    ``sequence()`` — days-per-group rows, bounded by the time span, not
    the fact count; the fill is ONE window over (group, day), the same
    partitioning the explode already has. A fact table of any size
    reduces to (groups × days) before the window runs.
    """
    obs = df.groupBy(group_col, date_col).agg(
        F.sum(value_col).cast("bigint").alias("__v")
    )
    bounds = obs.groupBy(group_col).agg(
        F.min(date_col).alias("__d0"), F.max(date_col).alias("__d1")
    )
    cal = bounds.select(
        group_col,
        F.explode(
            F.sequence(F.col("__d0"), F.col("__d1"), F.expr("interval 1 day"))
        ).alias(date_col),
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cal.join(obs, [group_col, date_col], "left")
        .select(
            group_col,
            date_col,
            F.last("__v", ignorenulls=True).over(w).alias(value_col),
            F.when(F.col("__v").isNull(), 0).otherwise(1)
            .cast("int")
            .alias("is_observed"),
        )
    )
