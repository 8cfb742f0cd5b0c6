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

import contextlib
import os
import threading
import time
import uuid
from collections.abc import Iterator, Sequence

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


LOCK_DIR = "_locks"
# An append holding a date lock longer than this is presumed crashed and
# its lock may be stolen. Generous vs a single-day batch (seconds).
LOCK_LEASE_SEC = 600.0
LOCK_WAIT_SEC = 120.0
# A daily batch carries one date (a backfill a handful); crossing this
# means the caller passed an unbatched historical load — split it.
MAX_LOCKED_DATES = 1000


class LockLostError(RuntimeError):
    """A held partition lock was dispossessed (the holder's lock inode no
    longer lives at the lock path — a stealer decided this holder was
    dead). The safe response is to abort before the write and retry."""


class _LockGuard:
    """Inode-identity view of the locks a holder believes it owns.

    Each acquired lock keeps its O_EXCL-created file OPEN: the heartbeat
    refreshes mtime THROUGH THE FD (``os.utime(fd)``), so a lock mid-way
    through a stealer's rename/restore window still looks live (its inode
    mtime keeps moving even while the name is parked at the stealer's
    grave path), and ``verify()`` compares ``fstat(fd).st_ino`` against
    ``stat(path).st_ino`` — the only authoritative "do I still hold it"
    check. A transient mismatch (the restore window) is ridden out with
    brief retries; a persistent one raises ``LockLostError``.
    """

    def __init__(self) -> None:
        self.held: list[tuple[str, int]] = []  # (path, fd)

    def verify(self, retries: int = 20, pause: float = 0.05) -> None:
        for path, fd in self.held:
            my_ino = os.fstat(fd).st_ino
            for attempt in range(retries):
                try:
                    if os.stat(path).st_ino == my_ino:
                        break
                except OSError:
                    pass
                if attempt == retries - 1:
                    raise LockLostError(
                        f"partition lock {path} was stolen from this holder"
                    )
                time.sleep(pause)


@contextlib.contextmanager
def _partition_locks(
    table_dir: str,
    dates: Sequence[str],
    lease_sec: float = LOCK_LEASE_SEC,
    wait_sec: float = LOCK_WAIT_SEC,
) -> Iterator[_LockGuard]:
    """Per-date-partition mutex via put-if-absent lock files (O_EXCL,
    the same atomic primitive as the snapshot OCC log): the loser of a
    race WAITS and retries, then re-reads the partition — so its
    duplicate rows anti-join away against the winner's committed rows.
    This is what turns append_day's read-antijoin-append from
    "single-writer-per-partition discipline" into the reference's
    actual guarantee (PK uniqueness under concurrent inserts,
    schema.sql:23 ON CONFLICT DO NOTHING).

    Dates are acquired in sorted order (no deadlock between writers
    locking overlapping date sets). A HEARTBEAT thread refreshes the
    mtime of every held lock at ``lease_sec / 4``, so a live holder —
    however long its append runs — never looks stale. A lock file whose
    mtime is older than ``lease_sec`` is therefore a crashed writer's;
    it is stolen by an atomic RENAME to a per-stealer unique name
    (rename succeeds for exactly one stealer — unlike unlink, a second
    stealer cannot also remove a lock the first stealer has already
    replaced), and the stolen inode is re-checked: if it is not the
    stale inode the stealer statted (the path was released and
    re-acquired by a live writer in between), the live lock is restored
    via ``os.link`` (put-if-absent) and the steal retried. If that
    restore loses a THIRD race (another waiter O_EXCL-created the path
    inside the rename window), the grave is still unlinked — but the
    dispossessed holder is not silently betrayed: holders heartbeat
    through their OPEN FD and re-verify their inode before committing
    (``_LockGuard.verify`` in ``append_day``), so a holder whose name
    was taken aborts with ``LockLostError`` instead of writing under a
    lock someone else now owns, and its release never unlinks the new
    owner's file (inode-guarded)."""
    d = os.path.join(table_dir, LOCK_DIR)
    os.makedirs(d, exist_ok=True)
    guard = _LockGuard()
    stop = threading.Event()

    def _heartbeat() -> None:
        while not stop.wait(lease_sec / 4):
            for _p, fd in list(guard.held):
                with contextlib.suppress(OSError):
                    os.utime(fd)

    beat = threading.Thread(target=_heartbeat, daemon=True)
    beat.start()
    token = uuid.uuid4().hex
    try:
        for date in sorted(set(dates)):
            path = os.path.join(d, f"{date}.lock")
            deadline = time.monotonic() + wait_sec
            while True:
                try:
                    fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    guard.held.append((path, fd))
                    break
                except FileExistsError:
                    try:
                        st = os.stat(path)
                    except OSError:
                        continue  # holder just released; re-race
                    if time.time() - st.st_mtime > lease_sec:
                        grave = f"{path}.steal-{token}"
                        try:
                            os.rename(path, grave)
                        except OSError:
                            continue  # lost the steal race; re-race
                        try:
                            stolen_live = (
                                os.stat(grave).st_ino != st.st_ino
                                and time.time() - os.path.getmtime(grave)
                                <= lease_sec
                            )
                        except OSError:
                            stolen_live = False
                        if stolen_live:
                            # grabbed a freshly re-acquired lock, not the
                            # stale one: put it back. If ANOTHER waiter
                            # claimed the path inside the window the link
                            # fails and the grave is dropped anyway — the
                            # dispossessed holder detects the inode swap
                            # at verify() and aborts, so two writers never
                            # both commit under this name.
                            with contextlib.suppress(OSError):
                                os.link(grave, path)
                        with contextlib.suppress(OSError):
                            os.unlink(grave)
                        continue  # re-race via O_EXCL
                    if time.monotonic() > deadline:
                        raise TimeoutError(
                            f"partition lock {path} held past {wait_sec}s"
                        ) from None
                    time.sleep(0.05)
        yield guard
    finally:
        stop.set()
        for path, fd in guard.held:
            with contextlib.suppress(OSError):
                # inode-guarded release: only remove the name if it still
                # refers to OUR lock file — never a successor holder's
                if os.stat(path).st_ino == os.fstat(fd).st_ino:
                    os.unlink(path)
            with contextlib.suppress(OSError):
                os.close(fd)


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

    Concurrency: the read-antijoin-append runs under per-date partition
    LOCKS (``_partition_locks``) — two writers racing on the same day
    serialize, the loser re-reads the winner's committed rows, and PK
    uniqueness holds like the reference's ON CONFLICT DO NOTHING under
    concurrent inserts. The batch's distinct dates are collected on the
    driver for this (bounded: a daily batch has one date, a backfill a
    handful; tripwired at ``MAX_LOCKED_DATES``) and double as partition
    pruning literals — an IN-list on the partition column prunes at the
    file listing, one step earlier than the previous semi-join.
    """
    batch = dedup_by_key(incoming, pk)
    # one computation of the (possibly expensive) incoming transform:
    # the distinct-date collect below and the write must agree
    batch = batch.localCheckpoint(eager=True)
    date_rows = batch.select(date_col).distinct().limit(MAX_LOCKED_DATES + 1).collect()
    if len(date_rows) > MAX_LOCKED_DATES:
        raise ValueError(
            f"append_day batch spans >{MAX_LOCKED_DATES} dates — split the backfill"
        )
    date_vals = [r[0] for r in date_rows]
    with _partition_locks(table_dir, [str(v) for v in date_vals]) as guard:
        if table_exists(table_dir):
            existing = read_table(spark, table_dir).filter(
                F.col(date_col).isin(date_vals)
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
            # last-moment dispossession check: if a stealer decided this
            # holder was dead (heartbeat froze past the lease) the write
            # must not race the new owner's anti-join
            guard.verify()
            batch.write.mode("append").partitionBy(date_col).parquet(table_dir)
            return n
        guard.verify()
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
