"""Data-layout t2 queries: z-order clustering keys and pruning-stats
manifests (operators/layout.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.layout import (
    partition_stats,
    zorder_key_sql,
)
from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table

_Z_SQL = zorder_key_sql(["l_partkey", "l_suppkey"], bits=16)


@register(
    "q_zorder_layout",
    oracle=f"""
    WITH z AS (
      SELECT l_partkey, l_suppkey,
             CAST(({_Z_SQL}) AS BIGINT) >> 14 AS bucket
      FROM lineitem)
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(l_partkey) AS min_l_partkey, MAX(l_partkey) AS max_l_partkey,
           MIN(l_suppkey) AS min_l_suppkey, MAX(l_suppkey) AS max_l_suppkey
    FROM z GROUP BY bucket
    """,
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order file assignment over (l_partkey, l_suppkey) plus the
    per-bucket min/max manifest it produces: interleaved-bit keys give
    every bucket a tight range on BOTH dimensions, so a range predicate
    on either column prunes to a narrow band of buckets — the
    OPTIMIZE-ZORDER property, verifiable in the output. Pure integer
    shift/mask codegen; one map-side-combined aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    z = li.selectExpr(
        "l_partkey", "l_suppkey", f"CAST(({_Z_SQL}) AS BIGINT) AS __zkey"
    )
    return partition_stats(
        z,
        F.shiftright(F.col("__zkey"), 14),
        ["l_partkey", "l_suppkey"],
    )


@register(
    "q_partition_stats",
    oracle="""
    SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(o_orderkey) AS min_o_orderkey, MAX(o_orderkey) AS max_o_orderkey,
           MIN(o_custkey) AS min_o_custkey, MAX(o_custkey) AS max_o_custkey
    FROM orders GROUP BY 1
    """,
)
def q_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-partition pruning manifest for orders: the min/max/count
    table a scan planner intersects with predicates to skip partitions
    (persisted next to data by sources/snapshots.py at deploy). One
    aggregate onto month keys — manifest cost is file-count-sized."""
    o = load_table(spark, sf_dir, "orders")
    return partition_stats(
        o,
        F.date_trunc("month", F.col("o_orderdate")).cast("date"),
        ["o_orderkey", "o_custkey"],
    )


@register(
    "q_bloom_skipping",
    oracle="""
    WITH rows_ AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS bucket,
             CAST(o_custkey AS VARCHAR) AS s, o_custkey
      FROM orders),
    bits AS (
      SELECT bucket,
             CAST('0x' || substr(md5(s), 8*j + 1, 8) AS BIGINT) % 1024 AS p
      FROM rows_ CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)),
    manifest AS (
      SELECT bucket, p // 32 AS word_idx,
             bit_or(CAST(1 AS BIGINT) << CAST(p % 32 AS INT)) AS word
      FROM bits GROUP BY bucket, p // 32),
    probes AS (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey < 8),
    pbits AS (
      SELECT o_custkey, j,
             CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 8*j + 1, 8)
                  AS BIGINT) % 1024 AS p
      FROM probes CROSS JOIN (SELECT unnest([0, 1, 2]) AS j)),
    pm AS (SELECT o_custkey, j, p // 32 AS word_idx,
                  CAST(1 AS BIGINT) << CAST(p % 32 AS INT) AS mask
           FROM pbits),
    hits AS (
      SELECT pm.o_custkey, m.bucket
      FROM manifest m JOIN pm ON m.word_idx = pm.word_idx
      WHERE (m.word & pm.mask) = pm.mask
      GROUP BY pm.o_custkey, m.bucket
      HAVING COUNT(DISTINCT pm.j) = 3),
    maybe AS (SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_buckets_maybe
              FROM hits GROUP BY o_custkey),
    truth AS (
      SELECT o_custkey,
             CAST(COUNT(DISTINCT date_trunc('month', o_orderdate)) AS BIGINT)
               AS n_buckets_true
      FROM orders WHERE o_custkey < 8 GROUP BY o_custkey)
    SELECT t.o_custkey, COALESCE(m.n_buckets_maybe, 0) AS n_buckets_maybe,
           t.n_buckets_true
    FROM truth t LEFT JOIN maybe m ON t.o_custkey = m.o_custkey
    """,
)
def q_bloom_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-manifest file skipping for equality predicates: build a
    per-month Bloom filter over o_custkey (operators/sketches.bloom_words
    — the companion of the min/max manifest for high-cardinality keys),
    then probe 8 customers and report how many month-buckets a
    ``o_custkey = ?`` scan still reads vs the true month count. maybe >=
    true always; the gap is the false-positive cost of m/k sizing."""
    from oic_options_chains_spark.operators.sketches import bloom_probe, bloom_words

    o = load_table(spark, sf_dir, "orders")
    month = F.date_trunc("month", F.col("o_orderdate")).cast("date")
    manifest = bloom_words(o, F.col("o_custkey"), month, m_bits=1024, k=3)
    probes = o.select("o_custkey").filter(F.col("o_custkey") < 8).distinct()
    maybe = bloom_probe(manifest, probes, "o_custkey", m_bits=1024, k=3)
    truth = (
        o.filter(F.col("o_custkey") < 8)
        .groupBy("o_custkey")
        .agg(
            F.count_distinct(F.date_trunc("month", F.col("o_orderdate")))
            .cast("bigint")
            .alias("n_buckets_true")
        )
    )
    return truth.join(maybe, "o_custkey", "left").select(
        "o_custkey",
        F.coalesce(F.col("n_buckets_maybe"), F.lit(0).cast("bigint")).alias(
            "n_buckets_maybe"
        ),
        "n_buckets_true",
    )


def _rdv_sql(key: str, n: int, alias: str) -> str:
    """Rendezvous shard as SQL: argmax over md5 weights, ties to the
    lowest shard (list_position returns the first occurrence)."""
    weights = ", ".join(
        f"CAST('0x' || substring(md5(CAST({key} AS VARCHAR) || ':' || '{s}'),"
        f" 1, 15) AS BIGINT)"
        for s in range(n)
    )
    return (
        f"CAST(list_position([{weights}],"
        f" list_aggregate([{weights}], 'max')) - 1 AS INT) AS {alias}"
    )


@register(
    "q_reshard_plan",
    oracle=f"""
    WITH assigned AS (
      SELECT {_rdv_sql("doc_id", 8, "old_shard")},
             {_rdv_sql("doc_id", 12, "new_shard")},
             CAST(n_chars AS BIGINT) AS w
      FROM documents)
    SELECT old_shard, new_shard,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(w) AS BIGINT) AS sum_weight,
           CAST(MAX(CASE WHEN old_shard <> new_shard THEN 1 ELSE 0 END)
                AS INT) AS moved
    FROM assigned GROUP BY old_shard, new_shard
    """,
)
def q_reshard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous-hash reshard manifest (operators/layout.reshard_plan):
    growing the corpus layout 8 -> 12 shards, which (old, new) cells
    move and how many bytes (n_chars as the weight). Highest-random-
    weight assignment gives MINIMAL movement — a key relocates only
    when one of the four NEW shards wins its argmax (expected 4/12 of
    keys), never between surviving shards, because every old shard
    keeps its exact weight function; mod hashing would move ~11/12 of
    the corpus. Row-local assignment + one grid-sized aggregation."""
    from oic_options_chains_spark.operators.layout import reshard_plan

    d = load_table(spark, sf_dir, "documents")
    return reshard_plan(d, "doc_id", n_old=8, n_new=12, weight_col="n_chars")
