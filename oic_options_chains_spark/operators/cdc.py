"""Snapshot-diff (CDC) operator: classify every key across two dataset
versions as added / removed / changed / kept.

The reference keeps per-day versioned snapshots and pushes them as Dolt
commits (dump-dolt.rkt:92-93,145-146 — per-day commit/push); diffing two
versions answers "what did this refresh actually change", the audit
question behind both the reference's versioned sink and a training-data
release process (datasheet deltas, eval-set drift checks, incremental
re-embedding worklists).

Scale: one full-outer equi-join on the key — a single co-partitioned
shuffle of both snapshots, with the comparison a codegen'd fingerprint
equality. No window, no driver state. At 100 TB this is the minimum
possible work for an unordered diff; when both snapshots are written
bucketed on the key (sources/warehouse.py), the exchange disappears
entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    fp_col: str = "fp",
) -> DataFrame:
    """(key, status, old_fp, new_fp) for every key present in either
    snapshot; ``status`` is 'added' (new only), 'removed' (old only),
    'changed' (both, fingerprints differ), or 'kept'.

    Both inputs must carry ``key`` and a content fingerprint ``fp_col``
    (any deterministic digest of the compared payload — md5 of the text,
    a struct hash of selected columns). Equality is on the fingerprint
    only, so callers choose what "changed" means by choosing what they
    hash."""
    o = old.select(F.col(key), F.col(fp_col).alias("__old_fp"))
    n = new.select(F.col(key), F.col(fp_col).alias("__new_fp"))
    joined = o.join(n, on=key, how="full_outer")
    status = (
        F.when(F.col("__old_fp").isNull(), F.lit("added"))
        .when(F.col("__new_fp").isNull(), F.lit("removed"))
        .when(F.col("__old_fp") != F.col("__new_fp"), F.lit("changed"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(
        F.col(key),
        status.alias("status"),
        F.col("__old_fp").alias("old_fp"),
        F.col("__new_fp").alias("new_fp"),
    )
