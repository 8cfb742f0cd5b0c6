"""Range (point-in-interval) join — the non-equi join family Spark has
no native operator for (a bare ``ON p BETWEEN s AND e`` plans as
BroadcastNestedLoop or a cartesian + filter).

Two strategies, chosen by which side is small:

- ``broadcast``: the intervals ARE small (calendar tables, maintenance
  windows, fee schedules) — broadcast them and let the nested-loop scan
  stream the big side once. Correct and optimal when |intervals| is
  thousands.
- ``bucket`` (the 100 TB path, both sides large): quantize time into
  calendar buckets; each interval explodes into the buckets it covers,
  each point has exactly one bucket, and the join becomes an EQUI-join
  on the bucket key (hash-shuffled, AQE-skew-splittable) followed by the
  exact bounds filter. Work is O(points + sum(interval spans in
  buckets) + true matches) — never |points| x |intervals|. Bucket
  granularity trades explode factor against bucket selectivity: month
  buckets suit year-scale intervals; use ``day`` for intraday spans.

The same decomposition underlies published distributed interval-join
designs (bucketed temporal joins); expressed here purely as
DataFrame ops so Catalyst keeps pushdown/pruning on both inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, granularity: str) -> Column:
    # date_trunc (not trunc) so sub-month granularities work; the
    # timestamp-typed bucket key joins exactly on both sides
    return F.date_trunc(granularity, col)


def interval_join(
    points: DataFrame,
    point_col: str,
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    strategy: str = "bucket",
    granularity: str = "month",
) -> DataFrame:
    """Rows of ``points`` x ``intervals`` where
    ``start_col <= point_col <= end_col`` (inclusive bounds, the SQL
    BETWEEN semantics). Output carries all columns of both inputs.

    Degenerate intervals are handled identically by BOTH strategies so
    they are interchangeable: an interval with ``start > end`` or a NULL
    bound matches nothing and is dropped up front (the SQL BETWEEN
    answer — without the pre-filter the bucket strategy would instead
    raise at runtime, since ``F.sequence`` with a positive step errors
    when start > stop)."""
    p = F.col(point_col)
    s, e = F.col(start_col), F.col(end_col)
    intervals = intervals.filter(s <= e)  # also drops NULL-bounded rows
    if strategy == "broadcast":
        return points.join(
            F.broadcast(intervals), on=(p >= s) & (p <= e), how="inner"
        )
    assert strategy == "bucket", f"unknown strategy {strategy!r}"
    covered = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                _bucket(s, granularity),
                _bucket(e, granularity),
                F.expr(f"interval 1 {granularity}"),
            )
        ),
    )
    bucketed_points = points.withColumn("__bucket", _bucket(p, granularity))
    return (
        bucketed_points.join(covered, on="__bucket")
        .filter((p >= s) & (p <= e))
        .drop("__bucket")
    )
