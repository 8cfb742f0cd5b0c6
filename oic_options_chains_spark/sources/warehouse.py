"""Date-partitioned parquet warehouse with conflict-ignore appends.

The reference's tables live in PostgreSQL with composite PKs and
``ON CONFLICT DO NOTHING`` inserts (reference: schema.sql:23,
transform-load.2025-08-19.rkt:209) — replays are free. Without an index,
the same guarantee is an anti-join against the pruned existing partition
before an append (SURVEY.md K1, operators/dedup.py), under the
single-writer-per-partition discipline noted in SURVEY.md section 7.3.

Scale: the table is ``partitionBy(date)`` (the reference's dated-folder
layout made durable); an incoming day prunes the existing side to one
partition, and AQE broadcasts it when small. At 100 TB, bucketing or
Z-ordering by ``act_symbol`` inside each date partition keeps the
reference's per-symbol queries one-file reads; a table format with MERGE
(Delta/Iceberg) replaces the anti-join with a metadata-level upsert but
the logical plan is identical.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.dedup import conflict_ignore_append, dedup_by_key


def table_exists(table_dir: str) -> bool:
    return os.path.isdir(table_dir) and any(
        not name.startswith((".", "_")) for name in os.listdir(table_dir)
    )


def read_table(
    spark: SparkSession, table_dir: str, merge_schema: bool = False
) -> DataFrame:
    """Scan the partitioned table. ``merge_schema=True`` reconciles a
    column added by a later day's load (K6's restore-with-null-column,
    but at the SCAN: old partitions surface the new column as NULL,
    matching the reference's ALTER TABLE ADD COLUMN semantics,
    schema.sql + restore path). Default off: schema merging reads every
    file's footer up front, which at warehouse scale is a driver-side
    listing cost worth paying only when evolution actually happened."""
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(table_dir)


def append_day(
    spark: SparkSession,
    table_dir: str,
    incoming: DataFrame,
    pk: Sequence[str],
    date_col: str = "date",
    cluster_by: Sequence[str] = (),
    return_count: bool = False,
) -> int | None:
    """Idempotent single-date append: in-batch PK dedup, anti-join against
    the existing date partition(s), then a partitioned append.

    The existing side is filtered with a semi-join on the incoming dates,
    so partition pruning keeps the read to the replayed day regardless of
    table size.

    ``cluster_by`` (typically ``["act_symbol"]``) hash-repartitions and
    sorts rows inside each date partition before the write, so parquet
    row-group min/max stats make per-symbol reads skip almost every file
    — the poor man's Z-order for the reference's dominant access pattern
    (one symbol, one day) without requiring a table format.
    """
    batch = dedup_by_key(incoming, pk)
    if table_exists(table_dir):
        dates = batch.select(date_col).distinct()
        existing = read_table(spark, table_dir).join(
            dates, on=date_col, how="left_semi"
        )
        batch = conflict_ignore_append(existing, batch, pk)
    if cluster_by:
        batch = batch.repartition(
            *[F.col(c) for c in cluster_by]
        ).sortWithinPartitions(*cluster_by)
    if return_count:
        # recon path (streaming per-batch counters): checkpoint so the
        # count and the write share one computation of the anti-join
        batch = batch.localCheckpoint(eager=True)
        n = batch.count()
        batch.write.mode("append").partitionBy(date_col).parquet(table_dir)
        return n
    batch.write.mode("append").partitionBy(date_col).parquet(table_dir)
    return None


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] = (),
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) by join key.

    Bucketing is the storage-level answer to the warehouse's dominant
    join pattern (chains x universe on the symbol key): two tables
    bucketed on the same key with the same bucket count join with ZERO
    exchanges — each task reads bucket i from both sides — and with
    ``sort_cols`` matching the join key the per-task sort disappears too.
    At 100 TB that converts the nightly enrichment join from a full
    corpus shuffle into a file-aligned merge.

    Written through the session catalog (``saveAsTable`` with an explicit
    ``path``) because bucket metadata lives in the catalog, not parquet;
    plain ``spark.read.parquet`` of the same files would forget the
    bucketing and reintroduce the shuffle. To also drop the merge-join
    sort, readers must set
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — safe
    here because this writer guarantees one file per bucket (see below).
    """
    # One file per bucket: repartition on the bucket hash first (same
    # murmur3 HashPartitioning the bucket spec uses). Spark only trusts
    # sortBy metadata — and skips the merge-join sort — when a bucket is
    # a single file; a multi-task write otherwise leaves one file per
    # (task, bucket) and reintroduces per-task sorts at read time.
    staged = df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    writer = (
        staged.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    """Catalog read that preserves bucket metadata (see write_bucketed)."""
    return spark.table(table_name)


def overwrite_table(spark: SparkSession, table_dir: str, state: DataFrame) -> None:
    """Replace the whole (small, SCD-0) table with a new merged state —
    the storage step for the ``weekly`` upsert (K3): compute
    ``operators.merge.upsert(read_table(...), batch)`` then persist here.
    The state is checkpointed first, truncating the lineage so the write
    plan no longer references the files it is replacing."""
    state.localCheckpoint(eager=True).write.mode("overwrite").parquet(table_dir)


def expire_raw_days(
    base_dir: str,
    keep_days: int,
    today: str,
    loaded_dates: set[str] | None = None,
) -> list[str]:
    """Raw-zone retention (SURVEY K7): delete dated raw folders older
    than ``keep_days`` before ``today`` (ISO yyyy-MM-dd folder names,
    the reference's layout). A folder is only expired if it has been
    loaded (``loaded_dates``, when given) — retention must never destroy
    the only copy of unprocessed data.

    Driver-side file ops by design: the raw zone is a directory tree,
    not a table; at deploy scale this maps to object-store lifecycle
    rules, and this function is the testable local analog. Returns the
    list of expired folder names (for the run log / recon metrics).
    """
    import datetime as dt
    import re
    import shutil

    cutoff = dt.date.fromisoformat(today) - dt.timedelta(days=keep_days)
    expired = []
    if not os.path.isdir(base_dir):
        return expired
    for name in sorted(os.listdir(base_dir)):
        if not re.fullmatch(r"\d{4}-\d{2}-\d{2}", name):
            continue
        day = dt.date.fromisoformat(name)
        if day >= cutoff:
            continue
        if loaded_dates is not None and name not in loaded_dates:
            continue
        shutil.rmtree(os.path.join(base_dir, name))
        expired.append(name)
    return expired


def compact_partition(
    spark: SparkSession,
    table_dir: str,
    date_value: str,
    target_files: int = 1,
    date_col: str = "date",
    cluster_by: Sequence[str] = (),
) -> None:
    """Rewrite one date partition into ``target_files`` files.

    Incremental appends (streaming micro-batches, late-file pickups)
    accumulate small files per partition; at cluster scale that degrades
    scan parallelism bookkeeping and footer overhead. Compaction is a
    per-partition rewrite — prunable, idempotent, and safe under the
    single-writer-per-partition discipline the appends already assume.
    """
    part_dir = f"{table_dir}/{date_col}={date_value}"
    rows = spark.read.parquet(part_dir)
    if cluster_by:
        staged = rows.repartition(
            target_files, *[F.col(c) for c in cluster_by]
        ).sortWithinPartitions(*cluster_by)
    else:
        staged = rows.coalesce(target_files)
    # checkpoint truncates lineage so the overwrite no longer reads its
    # own source files
    staged.localCheckpoint(eager=True).write.mode("overwrite").parquet(part_dir)
