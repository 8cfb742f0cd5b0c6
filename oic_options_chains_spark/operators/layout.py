"""Data-layout operators: z-order interleaving and pruning-stats
manifests — the file-skipping side of a 100 TB warehouse.

Partition pruning (sources/warehouse.py) only helps predicates on the
partition column. For everything else, scan cost is governed by how well
row-group/file min-max stats isolate a predicate — which is a DATA
LAYOUT property: sort by ``zorder_key(a, b)`` before writing and range
predicates on EITHER column touch a small band of files, because bit
interleaving keeps both dimensions' locality in one sort key (the
Delta/Iceberg OPTIMIZE ZORDER mechanism, expressed as a plain column).

``partition_stats`` is the manifest the skipping decision reads: per
bucket, min/max/count per column — tiny, broadcastable, and exactly
what ``sources/snapshots.py`` persists alongside data at deploy.

Everything is integer bit arithmetic (shiftleft/and/sum), so the keys
are engine-exact and the operators stay in whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each column into one bigint.

    Bit b of column j lands at position b*len(cols)+j, so consecutive
    key values alternate between dimensions — a space-filling curve
    coarse enough for file assignment. Columns are masked to ``bits``
    (callers rank/bucket unbounded domains first; bits*len(cols) must
    stay <= 63). Built as a flat sum of shift/mask terms: pure integer
    codegen, no UDF, no interleave loop at row time."""
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"bits*cols = {bits * n} exceeds a signed 64-bit key")
    parts = []
    for j, c in enumerate(cols):
        masked = c.cast("bigint").bitwiseAND(F.lit((1 << bits) - 1))
        for b in range(bits):
            bit = F.shiftright(masked, b).bitwiseAND(F.lit(1))
            parts.append(F.shiftleft(bit, b * n + j))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The same key as ``zorder_key`` as one SQL string (oracle mirror /
    selectExpr fast path — one parsed expression instead of bits*cols
    Column objects)."""
    n = len(cols)
    terms = []
    for j, c in enumerate(cols):
        m = f"(CAST({c} AS BIGINT) & {(1 << bits) - 1})"
        for b in range(bits):
            terms.append(f"((({m} >> {b}) & 1) << {b * n + j})")
    return " + ".join(terms)


def partition_stats(
    df: DataFrame, bucket: Column, cols: list[str]
) -> DataFrame:
    """Pruning manifest: per ``bucket``, row count plus min/max of each
    named column. One map-side-combined aggregate onto bucket keys
    (file-count-sized); the output is what a scan planner intersects
    with a predicate's range to decide which buckets to read."""
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return df.groupBy(bucket.alias("bucket")).agg(*aggs)


def compaction_plan(
    files: DataFrame,
    part_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-file compaction assignment: within each partition, pack
    files (in stable ``file_col`` order) into output bins of roughly
    ``target_bytes`` — the OPTIMIZE/compact planner of a lakehouse table
    whose streaming ingest (streaming/incremental.py) leaves one small
    file per micro-batch.

    Next-fit by cumulative size: bin = (running_total_before_this_file)
    DIV target — a file starts a new bin exactly when the previous ones
    filled it. Deterministic, integer-exact, and one window per
    PARTITION key (never global): the running sum shuffles once on
    ``part_col``, which is also how the rewrite itself would be
    parallelized — one task per (partition, bin). A bin can exceed
    target only by the one file that crosses the boundary, the standard
    bound for next-fit.

    Output: (part, file, size, bin, cum_bytes) per file."""
    w = (
        Window.partitionBy("part")
        .orderBy("file")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = files.select(
        F.col(part_col).alias("part"),
        F.col(file_col).alias("file"),
        F.col(size_col).cast("bigint").alias("size"),
    ).withColumn("cum_bytes", F.sum("size").over(w).cast("bigint"))
    return cum.select(
        "part",
        "file",
        "size",
        F.expr(f"(cum_bytes - size) div {int(target_bytes)}")
        .cast("bigint")
        .alias("bin"),
        "cum_bytes",
    )


def compaction_bins(plan: DataFrame) -> DataFrame:
    """Roll a ``compaction_plan`` up to its rewrite work-list: one row
    per (part, bin) with the file count and byte total — what the
    compactor actually schedules (skip bins with n_files = 1: rewriting
    a lone file buys nothing). Aggregate over the plan relation, keyed
    by the same partition column, so it reuses the plan's exchange."""
    return plan.groupBy("part", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("size").cast("bigint").alias("bin_bytes"),
        F.min("file").alias("first_file"),
        F.max("file").alias("last_file"),
    )


def key_skew_profile(df: DataFrame, key_col: str, k: int = 20) -> DataFrame:
    """(key, cnt, share_bp, rank): the k hottest values of ``key_col``
    with their basis-point share of all rows — the first diagnostic run
    before any shuffle-keyed job at scale (is this join/agg key safe, or
    does one customer own a third of the table?). Feeds the salting /
    AQE-skew decisions the skew operators implement.

    Two-phase: a map-side-combined count per key, then
    ``orderBy().limit(k)`` (plans as TakeOrderedAndProject: per-partition
    top-k, k-sized merge — no single-partition sort of the key relation)
    with the rank window touching only the k survivors. The total is a
    one-row aggregate broadcast into the share projection; share_bp
    divides integers bounded far below 2^53, so the floor is exact on
    any engine."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    total = counts.agg(F.sum("cnt").alias("__total"))
    top = counts.orderBy(F.col("cnt").desc(), F.col("key")).limit(k)
    ranked = top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.col("cnt").desc(), F.col("key")))
        .cast("int"),
    )
    return ranked.crossJoin(F.broadcast(total)).select(
        "key",
        "cnt",
        F.floor((F.lit(10000).cast("double") * F.col("cnt")) / F.col("__total"))
        .cast("bigint")
        .alias("share_bp"),
        "rank",
    )


def rendezvous_shard(key: Column, n_shards: int) -> Column:
    """Highest-random-weight (rendezvous) shard assignment: the shard s
    in [0, n_shards) maximizing md5(key ':' s) — ties (md5 collisions)
    to the lowest s via first-occurrence array_position. Unlike mod
    hashing, growing the shard count moves ONLY the keys whose new
    maximum lands on a new shard (expected (M-N)/M of them), because
    every surviving shard keeps its exact weight function — the
    minimal-movement property that makes resharding a 100 TB layout an
    incremental copy instead of a full rewrite."""
    weights = F.array(
        *[
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(":", key.cast("string"), F.lit(str(s)))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            for s in range(n_shards)
        ]
    )
    return (F.array_position(weights, F.array_max(weights)) - 1).cast("int")


def reshard_plan(
    df: DataFrame,
    key_col: str,
    n_old: int,
    n_new: int,
    weight_col: str | None = None,
) -> DataFrame:
    """The data-movement manifest for an N -> M rendezvous reshard:
    (old_shard, new_shard, n_keys, sum_weight, moved) — one row per
    observed (old, new) cell, weights summed so the copy planner knows
    the bytes, not just the key counts. Row-local assignment (both
    shard functions are per-key expressions over the SAME hash family,
    which is what guarantees old == new whenever the argmax survives)
    plus one grid-sized aggregation."""
    key = F.col(key_col)
    w = (
        F.col(weight_col).cast("bigint")
        if weight_col is not None
        else F.lit(1).cast("bigint")
    )
    assigned = df.select(
        rendezvous_shard(key, n_old).alias("old_shard"),
        rendezvous_shard(key, n_new).alias("new_shard"),
        w.alias("__w"),
    )
    return assigned.groupBy("old_shard", "new_shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("__w").cast("bigint").alias("sum_weight"),
        F.max((F.col("old_shard") != F.col("new_shard")).cast("int")).alias(
            "moved"
        ),
    )
