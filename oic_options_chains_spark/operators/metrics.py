"""Reconciliation counters as observed metrics (SURVEY.md A5/T5).

The reference prints attempted/succeeded/failed counts after each run
(transform-load.2025-08-19.rkt:425-427) by mutating driver-side counters
per file. Distributed, that is ``df.observe``: accumulator-backed metrics
collected DURING the action that materializes the DataFrame — zero extra
jobs, zero extra scans, exact under task retries (unlike bare
accumulators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
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
