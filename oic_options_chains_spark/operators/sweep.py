"""Interval sweep-line aggregation: maximum concurrency per group.

The classic "how many intervals are open at once" question — peak
concurrent sessions per service, peak in-flight requests per shard, peak
overlapping option-chain snapshots per symbol. The relational sweep:
every interval contributes a +1 event at its start and a -1 at its end
(half-open [s, e): the close sorts BEFORE an open at the same instant),
a per-group running sum walks the timeline, and the group's answer is
the maximum of that running sum plus the first instant it is reached.

Scale shape: ONE exchange on the group key feeds both the running-sum
window and the final aggregate; within a group the sweep is inherently
sequential (the documented bounded-single-reducer class — same contract
as the session_gap window), across groups it is fully parallel. The
final "max, then earliest time at the max" folds into a single
``max(struct(run, -t))`` — no self-join back onto the runs.

Every decision is integer or timestamp-exact: deltas are ±1, the order
key (t, delta, id) is a total order (each interval id contributes one
open and one close), and the peak tie-break is the negated epoch-micros
inside the struct max.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def max_concurrency(
    intervals: DataFrame,
    group_col: str,
    start: Column,
    end: Column,
    id_col: str,
) -> DataFrame:
    """(grp, max_concurrent, first_peak_ts) per group: the peak number
    of simultaneously open half-open intervals [start, end) and the
    earliest timestamp at which the peak is reached. ``id_col`` breaks
    order ties deterministically; ``end`` must be > ``start``."""
    base = intervals.select(
        F.col(group_col).alias("grp"),
        start.alias("__s"),
        end.alias("__e"),
        F.col(id_col).alias("__id"),
    )
    opens = base.select(
        "grp", F.col("__s").alias("t"), F.lit(1).alias("delta"), "__id"
    )
    closes = base.select(
        "grp", F.col("__e").alias("t"), F.lit(-1).alias("delta"), "__id"
    )
    sweep = opens.union(closes)
    w = (
        Window.partitionBy("grp")
        .orderBy("t", "delta", "__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = sweep.select(
        "grp", "t", F.sum("delta").over(w).cast("bigint").alias("run")
    )
    best = runs.groupBy("grp").agg(
        F.max(
            F.struct(F.col("run"), (-F.unix_micros(F.col("t"))).alias("__negt"))
        ).alias("__best")
    )
    return best.select(
        "grp",
        F.col("__best.run").alias("max_concurrent"),
        F.timestamp_micros(-F.col("__best.__negt")).alias("first_peak_ts"),
    )
