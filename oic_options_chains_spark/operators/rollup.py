"""Incremental rollup refresh — the continuous-aggregate / hypertable
pattern: a stored time-bucketed aggregate table is kept current by
MERGING the aggregate of only the NEW events, never recomputing history.

Correct because the kept aggregates are mergeable (counts and decimal
sums are commutative monoids): agg(A ∪ B) == merge(agg(A), agg(B)).
Averages and other ratios are derived at read time from the stored
(count, sum) pairs — storing a mean would break mergeability.

Scale notes: the delta aggregation is a partial+final hash agg over the
new slice only (one micro-batch / one day); the merge is a full-outer
join keyed on (bucket, key), which partition-prunes to the buckets the
delta actually touches when the rollup table is stored partitioned by
bucket date. Late data lands in old buckets and the same merge handles
it — no special path, exactly the idempotent-upsert story the warehouse
writes already use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ROLLUP_KEYS = ("bucket_start", "event_type")


def rollup_delta(events: DataFrame, bucket: str = "1 hour") -> DataFrame:
    """Aggregate a slice of events into rollup rows: (bucket_start,
    event_type, n_events, total_value). total_value is summed as
    decimal (order-independent) — the storable, mergeable form."""
    return (
        events.groupBy(F.window("ts", bucket).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def merge_rollup(existing: DataFrame, delta: DataFrame) -> DataFrame:
    """Monoid merge of two rollup states on (bucket_start, event_type):
    counts add, sums add, untouched rows pass through either side."""
    e, d = existing.alias("e"), delta.alias("d")
    keys = list(ROLLUP_KEYS)
    joined = e.join(d, on=keys, how="full_outer")
    zero = F.lit(0)
    zdec = F.lit(0).cast("decimal(28,2)")
    return joined.select(
        *keys,
        (
            F.coalesce(F.col("e.n_events"), zero)
            + F.coalesce(F.col("d.n_events"), zero)
        ).alias("n_events"),
        (
            F.coalesce(F.col("e.total_value"), zdec)
            + F.coalesce(F.col("d.total_value"), zdec)
        )
        .cast("decimal(28,2)")
        .alias("total_value"),
    )


def refresh_rollup(
    existing: DataFrame, new_events: DataFrame, bucket: str = "1 hour"
) -> DataFrame:
    """One refresh step: aggregate only the new slice, merge into the
    stored state. refresh(refresh(s, a), b) == rollup(a ∪ b ∪ s-source)
    for any split — locked by tests."""
    return merge_rollup(existing, rollup_delta(new_events, bucket))
