"""Reconciliation counters as observed metrics (SURVEY.md A5/T5).

The reference prints attempted/succeeded/failed counts after each run
(transform-load.2025-08-19.rkt:425-427) by mutating driver-side counters
per file. Distributed, that is ``df.observe``: accumulator-backed metrics
collected DURING the action that materializes the DataFrame — zero extra
jobs, zero extra scans, exact under task retries (unlike bare
accumulators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, Window
from pyspark.sql import functions as F


def observed_counts(
    df: DataFrame, flags: dict[str, F.Column] | None = None
) -> tuple[DataFrame, Observation]:
    """Attach an Observation counting total rows plus one conditional
    count per named flag column/predicate.

    Returns (df, observation); read ``observation.get`` AFTER an action on
    the returned DataFrame. Example::

        cells, obs = observed_counts(
            cells, {"failed": F.col("parse_error").isNotNull()}
        )
        cells.write.parquet(...)
        obs.get  # {'rows': 1500, 'failed': 3}
    """
    obs = Observation()
    aggs = [F.count(F.lit(1)).alias("rows")]
    for name, predicate in (flags or {}).items():
        aggs.append(
            F.sum(F.when(predicate, 1).otherwise(0)).cast("bigint").alias(name)
        )
    return df.observe(obs, *aggs), obs


def watermark_lateness_audit(
    df: DataFrame,
    arrival_col: str,
    time_col: str,
    delays_s: tuple[int, ...] = (0, 10, 60, 300, 900),
    tie_col: str | None = None,
) -> DataFrame:
    """Watermark tuning from a recorded stream: how many events would a
    watermark of each candidate delay DROP, measured from the stream's
    own out-of-orderness.

    An event's lateness is how far event time lags the high-water mark
    at its arrival: ``running_max(event_time, by arrival order) -
    event_time``. A Structured Streaming watermark of delay ``d`` drops
    exactly the events with lateness > d, so the audit table
    (delay_s, n_dropped, drop_bp) is the empirical curve an operator
    reads before choosing ``withWatermark``. All arithmetic on epoch
    microseconds (exact integers); drop_bp = floor(10000·n/total).

    Scale shape: the running max is one window ordered by the arrival
    column. A recorded stream's arrival order is a single global
    sequence, so the window is unavoidably one ordered pass — run the
    audit per ingest partition/day (compose upstream via partitionBy on
    the window) when the recording spans more than one executor's worth
    of events; the threshold roll-up then reduces a handful of counters.
    """
    us = (F.unix_micros(F.col(time_col).cast("timestamp"))).alias("__us")
    order = [F.col(arrival_col)] + ([F.col(tie_col)] if tie_col else [])
    w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep = [F.col(arrival_col)] + ([F.col(tie_col)] if tie_col else [])
    lat = df.select(*keep, us).select(
        (F.max("__us").over(w) - F.col("__us")).alias("__lat_us")
    )
    total = F.count(F.lit(1))
    aggs = [
        F.sum((F.col("__lat_us") > d * 1_000_000).cast("int"))
        .cast("bigint")
        .alias(f"__n{i}")
        for i, d in enumerate(delays_s)
    ]
    one = lat.agg(total.cast("bigint").alias("__total"), *aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("delay_s"),
                F.col(f"__n{i}").alias("n_dropped"),
                F.floor(F.lit(10000) * F.col(f"__n{i}") / F.col("__total"))
                .cast("bigint")
                .alias("drop_bp"),
            )
            for i, d in enumerate(delays_s)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select(
        "r.delay_s", "r.n_dropped", "r.drop_bp"
    )


def backfill_manifest(
    df: DataFrame,
    arrival_col: str,
    time_col: str,
    watermark_s: int,
    bucket: str = "hour",
    tie_col: str | None = None,
) -> DataFrame:
    """The worklist a watermark choice creates: events a watermark of
    ``watermark_s`` would have dropped, grouped by their EVENT-TIME
    bucket — exactly the partitions a batch backfill must recompute to
    reconcile the streaming tables. (watermark_lateness_audit sizes the
    drop; this names the partitions.)

    (bucket_start, n_late, min_lateness_s, max_lateness_s). Same single
    ordered pass as the audit, then a bucket-keyed aggregate."""
    us = (F.unix_micros(F.col(time_col).cast("timestamp"))).alias("__us")
    order = [F.col(arrival_col)] + ([F.col(tie_col)] if tie_col else [])
    w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    keep = [F.col(arrival_col), F.col(time_col)] + (
        [F.col(tie_col)] if tie_col else []
    )
    lat = df.select(*keep, us).select(
        F.col(time_col),
        (F.max("__us").over(w) - F.col("__us")).alias("__lat_us"),
    )
    late = lat.filter(F.col("__lat_us") > watermark_s * 1_000_000)
    return (
        late.groupBy(
            F.date_trunc(bucket, F.col(time_col)).alias("bucket_start")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_late"),
            (F.min("__lat_us") / 1_000_000).cast("bigint").alias("min_lateness_s"),
            (F.max("__lat_us") / 1_000_000).cast("bigint").alias("max_lateness_s"),
        )
    )
