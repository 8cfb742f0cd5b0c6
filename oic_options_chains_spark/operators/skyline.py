"""2-D skyline (Pareto frontier) — the points no other point weakly
dominates in both dimensions. Curation reads it as "the best documents
per length" (no longer document is also more lexically diverse), query
planning as cost/quality frontiers over candidate layouts.

Relational decomposition with NO global sort of the data:

  1. collapse to one row per distinct x: (x, max y, rows at that max) —
     a map-side-combined aggregate (any point below its own x's max is
     dominated by that max, so nothing else can ever reach the
     frontier);
  2. bucket x by a DOMAIN-bounded width and take per-bucket maxima —
     the bucket relation is value_range/width rows regardless of data
     size;
  3. prefix-max the bucket maxima from the high-x end (a window over
     the bounded bucket relation — the documented bounded-single-reducer
     class) and a per-bucket running max over x DESC (partitioned
     window, fully distributed);
  4. a per-x row is on the frontier iff its y strictly exceeds both the
     running max of higher x in its own bucket and the prefix max of
     all higher buckets.

Every comparison is integer; ties: equal (x, y) points share one
frontier row (n_rows counts them), a point with equal y at strictly
higher x dominates (frontier keeps the strict-max staircase).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pareto_frontier(
    df: DataFrame,
    x: Column,
    y: Column,
    bucket_width: int,
) -> DataFrame:
    """(x, y, n_rows): the strict-max staircase of ``max(y) per x`` —
    exactly the weakly-undominated distinct value pairs. ``x`` and ``y``
    must be integral; ``bucket_width`` buckets the X DOMAIN (pick it
    from the column's value range, not the row count)."""
    counts = df.select(x.cast("bigint").alias("x"), y.cast("bigint").alias("y")).groupBy(
        "x", "y"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    byx = counts.groupBy("x").agg(
        F.max("y").alias("y"), F.max_by("cnt", "y").alias("n_rows")
    )
    b = byx.withColumn("bucket", F.expr(f"x div {int(bucket_width)}"))

    bmax = b.groupBy("bucket").agg(F.max("y").alias("by"))
    w_hb = (
        Window.orderBy(F.col("bucket").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    hb = bmax.withColumn("hb_max", F.max("by").over(w_hb)).select("bucket", "hb_max")

    w_sb = (
        Window.partitionBy("bucket")
        .orderBy(F.col("x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    staged = (
        b.withColumn("sb_max", F.max("y").over(w_sb))
        .join(F.broadcast(hb), "bucket")
    )
    # greatest() skips NULLs (returns NULL only when BOTH are — the
    # global maximum, which is always on the frontier)
    dominated_by = F.greatest("sb_max", "hb_max")
    return staged.filter(
        dominated_by.isNull() | (F.col("y") > dominated_by)
    ).select("x", "y", "n_rows")
