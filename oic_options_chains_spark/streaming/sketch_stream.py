"""Streaming sketch maintenance: an HLL register table kept current by
micro-batch union-merge.

The batch side proved the sketch mergeable (q_hll_merge: per-shard
register sets MAX-merge into the exact global sketch); this is the
streaming corollary — each micro-batch's registers merge into a
persistent register table, so a running "distinct users/documents seen
so far" needs no reprocessing of history and no unbounded state store.

Replay safety comes from the algebra, not the checkpoint: MAX-merge is
IDEMPOTENT (merging the same batch twice cannot raise a rho a second
time), so an at-least-once ``foreachBatch`` retry leaves the register
table bit-identical — the same exactly-once-table-effect argument as the
conflict-ignore append (incremental.py T4), but carried by the sketch's
lattice structure instead of a primary key.

Scale: the state is AT MOST m = 2^b rows (256 at b=8) regardless of
stream volume; each micro-batch shuffles only its own distinct hashes
(map-side combined to <= m rows per partition). The merged write is a
bounded overwrite, the streaming analog of a metrics sink, never a
data-sized table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from oic_options_chains_spark.operators.sketches import (
    hll_estimate_from_registers,
    hll_merge_registers,
    hll_registers,
)


def _current_version(registers_dir: str) -> int | None:
    """The committed register-table version, or None when no merge has
    ever committed. An EXPLICIT existence probe of the pointer file (the
    ``warehouse.table_exists`` pattern) — never an except-Exception
    around the read, which would silently treat a transient read failure
    as 'table does not exist' and reset the accumulated sketch to one
    batch's registers."""
    path = os.path.join(registers_dir, "_CURRENT")
    if not os.path.isfile(path):
        return None
    with open(path) as fh:
        return int(fh.read().strip())


def _version_path(registers_dir: str, version: int) -> str:
    return os.path.join(registers_dir, f"v={version}")


def merge_into_register_table(
    spark: SparkSession,
    batch: DataFrame,
    col: str,
    registers_dir: str,
    b: int = 8,
) -> None:
    """Merge one (micro-)batch's HLL registers into the persisted
    register table at ``registers_dir`` (parquet, (reg, rho), <= 2^b
    rows). Safe to call repeatedly with the same batch.

    The replace is CRASH-ATOMIC, not mode("overwrite"): each merge
    writes a NEW version directory (so the read side of the merge is
    never deleted mid-write), then commits it by atomically renaming a
    pointer file. A crash at any point leaves the previous committed
    version intact and readable; an uncommitted version directory is
    overwritten by the next attempt. Single maintaining writer per
    ``registers_dir`` (the foreachBatch contract already serializes
    batches); superseded versions are pruned after commit."""
    new_regs = hll_registers(batch, col, b)
    cur = _current_version(registers_dir)
    if cur is not None:
        existing = spark.read.parquet(_version_path(registers_dir, cur))
        merged = hll_merge_registers(
            existing.selectExpr("'old' AS grp", "reg", "rho").unionByName(
                new_regs.selectExpr("'new' AS grp", "reg", "rho")
            )
        )
    else:
        merged = new_regs
    nxt = 0 if cur is None else cur + 1
    merged.write.mode("overwrite").parquet(_version_path(registers_dir, nxt))
    tmp = os.path.join(registers_dir, "_CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(str(nxt))
    os.replace(tmp, os.path.join(registers_dir, "_CURRENT"))
    for name in os.listdir(registers_dir):
        if name.startswith("v=") and name != f"v={nxt}":
            shutil.rmtree(os.path.join(registers_dir, name), ignore_errors=True)


def run_incremental_distinct(
    spark: SparkSession,
    stream: DataFrame,
    col: str,
    registers_dir: str,
    checkpoint_dir: str,
    b: int = 8,
):
    """Drain a stream, maintaining the running-distinct register table;
    stops when all available input is processed (AvailableNow), same
    cadence contract as the raw-zone loads. Returns the terminated
    StreamingQuery so callers (tools/stream_bench.py) can read its
    per-micro-batch progress."""

    def process(batch: DataFrame, _batch_id: int) -> None:
        merge_into_register_table(spark, batch, col, registers_dir, b)

    q = (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_running_estimate(
    spark: SparkSession, registers_dir: str, b: int = 8
) -> DataFrame:
    """The current distinct-count estimate from the persisted registers —
    a metadata-sized read, independent of how much data ever streamed.
    Reads the COMMITTED version via the pointer file, so a concurrent
    merge (which writes a new version before flipping the pointer) can
    never hand it a partially-written directory."""
    cur = _current_version(registers_dir)
    if cur is None:
        raise FileNotFoundError(
            f"no committed register table at {registers_dir}"
        )
    return hll_estimate_from_registers(
        spark.read.parquet(_version_path(registers_dir, cur)), b
    )
