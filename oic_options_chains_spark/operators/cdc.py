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

from pyspark.sql import DataFrame, Window
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


def scd2_history(
    events: DataFrame,
    key: str,
    attr: str,
    ts: str,
    tiebreak: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history from an append-only
    change feed: collapse each key's consecutive runs of the same
    attribute value into validity intervals (key, value, effective_from,
    effective_to, n_rows, version), effective_to NULL on the current row.

    The reference's Dolt-versioned sink (dump-dolt.rkt:92-93) keeps
    per-day snapshots; SCD2 is the warehouse-side derivation those
    snapshots exist to answer — "what was this key's value AT time t"
    becomes a plain range predicate on (effective_from, effective_to).

    Gaps-and-islands, all engine-exact: a change flag against
    ``lag(attr)`` over the (ts, tiebreak) total order, a running sum of
    flags numbering each island, then one aggregate per island and a
    ``lead`` for the closing edge. ``tiebreak`` must make the per-key
    order total (a unique event id) — otherwise lag order is
    engine-defined and runs can differ.

    Scale: two windows and one aggregate, ALL partitioned by the key —
    a single hash exchange on ``key`` reused across every stage (Spark
    plans one Exchange; the windows and the groupBy share it). No global
    window, no driver state; skewed keys split fine under AQE because
    every stage keys on the same column."""
    w = Window.partitionBy(key).orderBy(ts, tiebreak)
    flagged = events.select(
        key, attr, ts, tiebreak
    ).withColumn(
        "__chg",
        F.when(
            F.lag(attr).over(w).isNull()
            | (F.lag(attr).over(w) != F.col(attr)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = flagged.withColumn("__run", F.sum("__chg").over(w))
    islands = runs.groupBy(key, "__run").agg(
        F.min(attr).alias(attr),  # constant within the island
        F.min(ts).alias("effective_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    w2 = Window.partitionBy(key).orderBy("__run")
    return islands.select(
        key,
        attr,
        "effective_from",
        F.lead("effective_from").over(w2).alias("effective_to"),
        "n_rows",
        F.col("__run").cast("bigint").alias("version"),
    )
