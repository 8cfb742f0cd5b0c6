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

from pyspark.sql import DataFrame, SparkSession

from oic_options_chains_spark.operators.sketches import (
    hll_estimate_from_registers,
    hll_merge_registers,
    hll_registers,
)


def merge_into_register_table(
    spark: SparkSession,
    batch: DataFrame,
    col: str,
    registers_dir: str,
    b: int = 8,
) -> None:
    """Merge one (micro-)batch's HLL registers into the persisted
    register table at ``registers_dir`` (parquet, (reg, rho), <= 2^b
    rows). Safe to call repeatedly with the same batch."""
    new_regs = hll_registers(batch, col, b)
    try:
        existing = spark.read.parquet(registers_dir)
        has_existing = True
    except Exception:
        has_existing = False
    if has_existing:
        merged = hll_merge_registers(
            existing.selectExpr("'old' AS grp", "reg", "rho").unionByName(
                new_regs.selectExpr("'new' AS grp", "reg", "rho")
            )
        )
    else:
        merged = new_regs
    # localCheckpoint truncates lineage so the overwrite no longer
    # references the files it replaces; the table is <= 2^b rows.
    merged.localCheckpoint(eager=True).write.mode("overwrite").parquet(
        registers_dir
    )


def run_incremental_distinct(
    spark: SparkSession,
    stream: DataFrame,
    col: str,
    registers_dir: str,
    checkpoint_dir: str,
    b: int = 8,
) -> None:
    """Drain a stream, maintaining the running-distinct register table;
    stops when all available input is processed (AvailableNow), same
    cadence contract as the raw-zone loads."""

    def process(batch: DataFrame, _batch_id: int) -> None:
        merge_into_register_table(spark, batch, col, registers_dir, b)

    (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_running_estimate(
    spark: SparkSession, registers_dir: str, b: int = 8
) -> DataFrame:
    """The current distinct-count estimate from the persisted registers —
    a metadata-sized read, independent of how much data ever streamed."""
    return hll_estimate_from_registers(spark.read.parquet(registers_dir), b)
