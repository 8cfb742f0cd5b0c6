"""Idempotent append: the reference's ``INSERT ... ON CONFLICT DO NOTHING``
(reference: transform-load.2025-08-19.rkt:175-209,305-395; SURVEY.md K1/K2).

Without a PK index, conflict-ignore decomposes into two set operations:
in-batch dedup on the key, then an anti-join against the existing table.
Replaying a day is then a no-op — the reference's recovery story (T4).

Scale notes: the anti-join shuffles on the PK, but with the fact table
date-partitioned and incoming batches single-date, partition pruning cuts
"existing" to one partition; AQE turns the anti-join into a broadcast when
the pruned side is small. Single-writer-per-partition discipline is assumed
(SURVEY.md section 7.3 item 5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame


def dedup_by_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """In-batch PK dedup. ``dropDuplicates`` keeps an arbitrary row per key;
    the reference kept the first-inserted row, which is only observable when
    duplicate keys carry different payloads — its PK absorbed those silently
    (SURVEY.md section 7.3 item 3). Callers needing a deterministic winner
    should pre-sort via ``latest_per_key`` instead."""
    return df.dropDuplicates(list(keys))


def conflict_ignore_append(
    existing: DataFrame, incoming: DataFrame, keys: Sequence[str]
) -> DataFrame:
    """Rows of ``incoming`` that survive conflict-ignore against
    ``existing``: in-batch dedup then left-anti on the PK."""
    deduped = dedup_by_key(incoming, keys)
    return deduped.join(existing.select(*keys), on=list(keys), how="left_anti")
