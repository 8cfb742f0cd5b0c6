"""Core t2 queries: the reference's operator inventory (SURVEY.md section 2)
re-expressed over the synthetic tables, each with a DuckDB oracle.

Cross-engine determinism rules used throughout (SURVEY.md section 7.3):

- Never aggregate raw doubles (summation order differs); cast to a pinned
  DecimalType first — source doubles are 2-decimal money/quantities, so a
  scale-2 cast is exact in both engines.
- Pin every computed column's type with an outer CAST on both sides.
- Windows always carry a deterministic tie-break key.
- Ratios stay in DOUBLE with identical operation order, then FLOOR — floor
  of bit-identical doubles is engine-independent, unlike rounding.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oic_options_chains_spark.functions.cleaning import enum_map, sentinel_to_null
from oic_options_chains_spark.functions.dates import prior_year_date
from oic_options_chains_spark.functions.decimal_ops import trunc_n
from oic_options_chains_spark.functions.literals import values_df
from oic_options_chains_spark.operators.asof import latest_per_key
from oic_options_chains_spark.operators.dedup import conflict_ignore_append
from oic_options_chains_spark.operators.merge import upsert
from oic_options_chains_spark.operators.nearest import (
    nearest_date_selection,
    nearest_selection,
)
from oic_options_chains_spark.operators.validate import fk_violations
from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# --------------------------------------------------------------------------
# Set operations / universe query (SURVEY.md U1/U2, O3; extract.rkt:73-108)
# --------------------------------------------------------------------------


@register(
    "q_union_distinct",
    oracle="""
    SELECT c_custkey AS entity_key FROM customer
    UNION
    SELECT s_suppkey AS entity_key FROM supplier
    """,
)
def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symbol-universe UNION: components ∪ ETFs, SQL UNION dedups
    (reference: extract.rkt:89)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("entity_key"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_suppkey").alias("entity_key"))
    return c.union(s).distinct()


@register(
    "q_inlist_filter",
    oracle="""
    SELECT n_nationkey, n_name FROM nation
    WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11', 'NO_SUCH')
    """,
)
def q_inlist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list universe filter (reference: extract.rkt:79)."""
    n = _t(spark, sf_dir, "nation")
    return n.filter(
        F.col("n_name").isin("NATION_3", "NATION_7", "NATION_11", "NO_SUCH")
    ).select("n_nationkey", "n_name")


@register(
    "q_range_filter",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_name >= 'Customer#000000100' AND c_name <= 'Customer#000000400'
    """,
)
def q_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optional CLI-driven symbol range (reference: extract.rkt:81-88,
    96-103): filters are built conditionally in Python so unset bounds
    vanish from the plan instead of emulating `case when $1 != ''`."""
    first_symbol: str | None = "Customer#000000100"
    last_symbol: str | None = "Customer#000000400"
    df = _t(spark, sf_dir, "customer")
    if first_symbol is not None:
        df = df.filter(F.col("c_name") >= first_symbol)
    if last_symbol is not None:
        df = df.filter(F.col("c_name") <= last_symbol)
    return df.select("c_custkey", "c_name")


@register(
    "q_latest_snapshot",
    oracle="""
    SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS snapshot_date,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS snapshot_price
    FROM orders
    WHERE o_orderdate = (SELECT max(o_orderdate) FROM orders)
    """,
)
def q_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-snapshot scalar-subquery filter (reference: extract.rkt:80,95):
    agg max + broadcast join, no collect."""
    o = _t(spark, sf_dir, "orders")
    latest = o.agg(F.max("o_orderdate").alias("__max_date"))
    return (
        o.join(F.broadcast(latest), o["o_orderdate"] == latest["__max_date"])
        .select(
            "o_orderkey",
            "o_custkey",
            F.col("o_orderdate").cast("date").alias("snapshot_date"),
            # Decimals stringify at the pinned scale on both engines — the
            # only final representation the driver's value hash treats as
            # equal across Spark Decimal('40.00') and DuckDB 40.00.
            F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("snapshot_price"),
        )
    )


@register(
    "q_semi_join",
    oracle="""
    SELECT c.c_custkey, replace(c.c_name, 'Customer#', 'CUST/') AS vendor_symbol
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Universe ∩ lookup semi-join with vendor-symbol remap (reference:
    extract.2023-11-16.rkt:163-173; SURVEY.md J1/U2/F9)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    return c.join(
        o, on=c["c_custkey"] == o["o_custkey"], how="left_semi"
    ).select(
        "c_custkey",
        F.regexp_replace("c_name", "Customer#", "CUST/").alias("vendor_symbol"),
    )


# --------------------------------------------------------------------------
# As-of join / latest-per-key (SURVEY.md J2/W1/A1/A2)
# --------------------------------------------------------------------------

ASOF_DATE = dt.date(1998, 6, 30)


@register(
    "q_asof_price",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS asof_date,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS asof_price,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
      WHERE o_orderdate <= TIMESTAMP '1998-06-30 00:00:00'
    )
    SELECT o_custkey, asof_date, asof_price FROM ranked WHERE rn = 1
    """,
)
def q_asof_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of lookup: greatest date <= D per key (reference:
    transform-load.2025-08-19.rkt:104-113)."""
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") <= F.lit(ASOF_DATE).cast("timestamp")
    )
    return latest_per_key(
        o, ["o_custkey"], "o_orderdate", tiebreak=["o_orderkey"]
    ).select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("asof_date"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("asof_price"),
    )


@register(
    "q_asof_tolerance",
    oracle="""
    WITH cand AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS next_date,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS next_price,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate ASC, o_orderkey ASC) AS rn
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1998-06-30 00:00:00'
        AND datediff('day', DATE '1998-06-30', CAST(o_orderdate AS DATE)) <= 30
    )
    SELECT c.c_custkey, cand.next_date, cand.next_price
    FROM customer c
    LEFT JOIN cand ON c.c_custkey = cand.o_custkey AND cand.rn = 1
    """,
)
def q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance: earliest order ON/after the as-of
    date within 30 days per customer, NULL when none — completing the
    merge_asof backward/forward/tolerance trio on operators/asof.py. The
    tolerance doubles as the scan-pruning lever at warehouse scale."""
    from oic_options_chains_spark.operators.asof import asof_join

    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", F.lit(ASOF_DATE).cast("timestamp").alias("target_ts")
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        "o_orderdate",
        "o_totalprice",
        "o_orderkey",
    )
    out = asof_join(
        c,
        o,
        on=["c_custkey"],
        left_time="target_ts",
        right_time="o_orderdate",
        tiebreak=["o_orderkey"],
        direction="forward",
        tolerance_days=30,
    )
    return out.select(
        "c_custkey",
        F.col("o_orderdate").cast("date").alias("next_date"),
        F.col("o_totalprice")
        .cast("decimal(18,2)")
        .cast("string")
        .alias("next_price"),
    )


# --------------------------------------------------------------------------
# Nearest-selection (SURVEY.md J3/J4/A4/W2/O4)
# --------------------------------------------------------------------------

# Four expiry targets at +2/+4/+6/+8 weeks from the as-of date
# (reference: transform-load.2025-08-19.rkt:123-126).
NEAREST_TARGET_DATES = [
    dt.date(1998, 7, 14),
    dt.date(1998, 7, 28),
    dt.date(1998, 8, 11),
    dt.date(1998, 8, 25),
]


@register(
    "q_nearest_event",
    oracle="""
    WITH dates AS (SELECT DISTINCT CAST(l_shipdate AS DATE) AS ship_date FROM lineitem),
    targets AS (
      SELECT UNNEST([DATE '1998-07-14', DATE '1998-07-28',
                     DATE '1998-08-11', DATE '1998-08-25']) AS target_date),
    ranked AS (
      SELECT t.target_date, d.ship_date,
             CAST(abs(datediff('day', t.target_date, d.ship_date)) AS INT) AS dist_days,
             row_number() OVER (
               PARTITION BY t.target_date
               ORDER BY abs(datediff('day', t.target_date, d.ship_date)), d.ship_date
             ) AS rn
      FROM targets t CROSS JOIN dates d)
    SELECT w.target_date, w.ship_date, w.dist_days, l.l_orderkey, l.l_linenumber
    FROM (SELECT * FROM ranked WHERE rn = 1) w
    JOIN lineitem l ON CAST(l.l_shipdate AS DATE) = w.ship_date
    """,
)
def q_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-expiration argmin + semi-join back to keep every row at the
    winning date (reference: transform-load.2025-08-19.rkt:51-58,147-149).
    Tie-break: earliest date wins (fold with strict <, parse order)."""
    li = _t(spark, sf_dir, "lineitem")
    dates = li.select(F.col("l_shipdate").cast("date").alias("ship_date")).distinct()
    targets = values_df(spark, "target_date", NEAREST_TARGET_DATES, "date")
    winners = nearest_date_selection(
        dates, [], "ship_date", targets, "target_date"
    ).select(
        "target_date", "ship_date", F.col("distance").cast("int").alias("dist_days")
    )
    return winners.join(
        li, on=F.col("l_shipdate").cast("date") == F.col("ship_date")
    ).select("target_date", "ship_date", "dist_days", "l_orderkey", "l_linenumber")


@register(
    "q_nearest_strike",
    oracle="""
    WITH qty AS (
      SELECT DISTINCT l_returnflag, CAST(l_quantity AS DECIMAL(10,2)) AS qty
      FROM lineitem),
    targets AS (
      SELECT UNNEST([CAST(10.5 AS DECIMAL(10,2)), CAST(25.25 AS DECIMAL(10,2)),
                     CAST(40.0 AS DECIMAL(10,2))]) AS target_qty),
    ranked AS (
      SELECT q.l_returnflag, t.target_qty, q.qty,
             row_number() OVER (
               PARTITION BY q.l_returnflag, t.target_qty
               ORDER BY abs(q.qty - t.target_qty), q.qty) AS rn
      FROM qty q CROSS JOIN targets t)
    SELECT l_returnflag, CAST(target_qty AS VARCHAR) AS target_qty,
           CAST(qty AS VARCHAR) AS nearest_qty
    FROM ranked WHERE rn = 1
    """,
)
def q_nearest_strike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-strike argmin per group with first-in-order tie-break
    (reference: transform-load.2025-08-19.rkt:60-66,150-151). Targets are
    exact decimals, as the reference's rational strike targets (F20)."""
    li = _t(spark, sf_dir, "lineitem")
    qty = li.select(
        "l_returnflag", F.col("l_quantity").cast("decimal(10,2)").alias("qty")
    ).distinct()
    targets = values_df(
        spark,
        "target_qty",
        [Decimal("10.50"), Decimal("25.25"), Decimal("40.00")],
        "decimal(10,2)",
    )
    return nearest_selection(qty, ["l_returnflag"], "qty", targets, "target_qty").select(
        "l_returnflag",
        F.col("target_qty").cast("string").alias("target_qty"),
        F.col("qty").cast("string").alias("nearest_qty"),
    )


# --------------------------------------------------------------------------
# Idempotent writes: conflict-ignore + upsert (SURVEY.md K1/K3)
# --------------------------------------------------------------------------


@register(
    "q_dedup_pk",
    oracle="""
    WITH existing AS (SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber <= 2),
    incoming AS (
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber >= 2
      UNION ALL
      SELECT l_orderkey, l_linenumber FROM lineitem WHERE l_linenumber >= 2),
    deduped AS (SELECT DISTINCT l_orderkey, l_linenumber FROM incoming)
    SELECT d.l_orderkey, d.l_linenumber FROM deduped d
    WHERE NOT EXISTS (
      SELECT 1 FROM existing e
      WHERE e.l_orderkey = d.l_orderkey AND e.l_linenumber = d.l_linenumber)
    """,
)
def q_dedup_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conflict-ignore insert as in-batch dedup + anti-join (reference:
    transform-load.2025-08-19.rkt:209). The doubled incoming slice models a
    replayed batch; overlap with `existing` models already-loaded rows."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    existing = li.filter(F.col("l_linenumber") <= 2)
    incoming_once = li.filter(F.col("l_linenumber") >= 2)
    incoming = incoming_once.unionAll(incoming_once)
    return conflict_ignore_append(existing, incoming, ["l_orderkey", "l_linenumber"])


UPSERT_SPLIT = dt.datetime(2024, 1, 15)


@register(
    "q_upsert_merge",
    oracle="""
    WITH target AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS effective_date,
             MAX(CAST(ts AS DATE)) AS last_seen
      FROM events WHERE ts < TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id),
    batch AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS effective_date,
             MAX(CAST(ts AS DATE)) AS last_seen
      FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00' GROUP BY user_id)
    SELECT COALESCE(b.user_id, t.user_id) AS user_id,
           CASE WHEN b.user_id IS NOT NULL THEN b.effective_date ELSE t.effective_date END AS effective_date,
           CASE WHEN b.user_id IS NOT NULL THEN b.last_seen ELSE t.last_seen END AS last_seen
    FROM target t FULL OUTER JOIN batch b ON t.user_id = b.user_id
    """,
)
def q_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly-membership upsert: batch overwrites matches, keeps the rest
    (reference: weeklies-transform-load.rkt:52-64)."""
    ev = _t(spark, sf_dir, "events")

    def snapshot(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id").agg(
            F.min(F.col("ts").cast("date")).alias("effective_date"),
            F.max(F.col("ts").cast("date")).alias("last_seen"),
        )

    target = snapshot(ev.filter(F.col("ts") < F.lit(UPSERT_SPLIT)))
    batch = snapshot(ev.filter(F.col("ts") >= F.lit(UPSERT_SPLIT)))
    return upsert(target, batch, ["user_id"])


@register(
    "q_fk_antijoin",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey FROM lineitem l
    WHERE NOT EXISTS (
      SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey AND p.p_size > 25)
    """,
)
def q_fk_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FK audit as left-anti vs a (filtered) dimension (reference:
    schema.sql:24-26; SURVEY.md J5)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey")
    part = _t(spark, sf_dir, "part").filter(F.col("p_size") > 25)
    return fk_violations(li, part, ["l_partkey"], ["p_partkey"])


# --------------------------------------------------------------------------
# Filters / projections / export shapes (SURVEY.md P1-P12, K4, K6, O1, O2)
# --------------------------------------------------------------------------


@register(
    "q_partition_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) BETWEEN DATE '1997-01-01' AND DATE '1997-12-31'
    """,
)
def q_partition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key range filter (reference: dump-dolt.rkt:70-71,84-86);
    prunes to one date partition on a partitioned fact table."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").cast("date").between("1997-01-01", "1997-12-31")
    ).select(
        "l_orderkey", "l_linenumber", F.col("l_shipdate").cast("date").alias("ship_date")
    )


@register(
    "q_notnull_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE NULLIF(l_returnflag, 'N') IS NOT NULL
      AND NULLIF(l_linestatus, 'F') IS NOT NULL
    """,
)
def q_notnull_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All-columns-not-null export filter (reference: dump-dat.rkt:69-76)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        F.nullif(F.col("l_returnflag"), F.lit("N")).isNotNull()
        & F.nullif(F.col("l_linestatus"), F.lit("F")).isNotNull()
    ).select("l_orderkey", "l_linenumber")


@register(
    "q_contains_filter",
    oracle="""
    SELECT doc_id FROM documents
    WHERE NOT contains(text, 'slow') AND NOT starts_with(text, 'spark')
    """,
)
def q_contains_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bad-page sentinel skip (reference:
    transform-load.2025-08-19.rkt:290-292; SURVEY.md P9/F8)."""
    d = _t(spark, sf_dir, "documents")
    return d.filter(
        ~F.col("text").contains("slow") & ~F.col("text").startswith("spark")
    ).select("doc_id")


@register(
    "q_distinct_dates",
    oracle="""
    SELECT DISTINCT CAST(o_orderdate AS DATE) AS snapshot_date FROM orders
    ORDER BY snapshot_date
    """,
)
def q_distinct_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted distinct export-driver dates (reference: dump-dolt.rkt:78-90)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(F.col("o_orderdate").cast("date").alias("snapshot_date"))
        .distinct()
        .orderBy("snapshot_date")
    )


@register(
    "q_export_projection",
    oracle="""
    SELECT c.c_custkey,
           CAST(CAST(c.c_acctbal AS DECIMAL(12,2)) AS VARCHAR) AS acctbal_str,
           COALESCE(NULLIF(c.c_mktsegment, 'BUILDING'), '') AS segment_str,
           n.n_name AS nation_name, r.r_name AS region_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def q_export_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export projection: text casts + null-coalesce through dimension joins
    (reference: dump-dolt.rkt:54-67,107-120). Dimensions broadcast."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select(
            "c_custkey",
            F.col("c_acctbal").cast("decimal(12,2)").cast("string").alias("acctbal_str"),
            F.coalesce(
                F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("")
            ).alias("segment_str"),
            F.col("n_name").alias("nation_name"),
            F.col("r_name").alias("region_name"),
        )
    )


@register(
    "q_multikey_sort",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(l_quantity AS DECIMAL(12,2)) AS VARCHAR) AS quantity_str,
           l_orderkey, l_linenumber
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus, CAST(l_quantity AS DECIMAL(12,2)),
             l_orderkey, l_linenumber
    """,
)
def q_multikey_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export sort with a numeric cast inside the sort key while the
    projection stringifies it (reference: dump-dolt.rkt:72-73)."""
    li = _t(spark, sf_dir, "lineitem")
    qty_dec = F.col("l_quantity").cast("decimal(12,2)")
    return li.orderBy(
        "l_returnflag", "l_linestatus", qty_dec, "l_orderkey", "l_linenumber"
    ).select(
        "l_returnflag",
        "l_linestatus",
        qty_dec.cast("string").alias("quantity_str"),
        "l_orderkey",
        "l_linenumber",
    )


@register(
    "q_restore_null_col",
    oracle="""
    SELECT r_regionkey, r_name, CAST(CAST(NULL AS DECIMAL(10,2)) AS VARCHAR) AS model_value
    FROM region
    """,
)
def q_restore_null_col(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Restore path: add a typed NULL column for a schema gap (reference:
    restore-from-dolt.rkt:64)."""
    r = _t(spark, sf_dir, "region")
    return r.select(
        "r_regionkey",
        "r_name",
        F.lit(None).cast("decimal(10,2)").cast("string").alias("model_value"),
    )


# --------------------------------------------------------------------------
# Aggregations / counters (SURVEY.md A1-A6)
# --------------------------------------------------------------------------


@register(
    "q_count_recon",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS attempted,
           CAST(COUNT(*) FILTER (WHERE event_type <> 'error') AS BIGINT) AS loaded,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS failed
    FROM events
    """,
)
def q_count_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reconciliation counters: attempted vs loaded vs failed (reference:
    transform-load.2025-08-19.rkt:425-427)."""
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.count(F.lit(1)).alias("attempted"),
        F.count(F.when(F.col("event_type") != "error", 1)).alias("loaded"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("failed"),
    )


@register(
    "q_group_count",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM events GROUP BY event_type
    """,
)
def q_group_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group row count (reference: transform-load.2025-08-19.rkt:173)."""
    return _t(spark, sf_dir, "events").groupBy("event_type").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "q_year_extrema",
    oracle="""
    WITH ranked AS (
      SELECT user_id, value, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, ts ASC, event_id ASC) AS rn_hi,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value ASC, ts ASC, event_id ASC) AS rn_lo
      FROM events)
    SELECT h.user_id, h.value AS high_value, CAST(h.ts AS DATE) AS high_date,
           l.value AS low_value, CAST(l.ts AS DATE) AS low_date
    FROM (SELECT * FROM ranked WHERE rn_hi = 1) h
    JOIN (SELECT * FROM ranked WHERE rn_lo = 1) l USING (user_id)
    """,
)
def q_year_extrema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-high/low with associated date: max_by/min_by as deterministic
    windows (reference: schema.sql:36-39; SURVEY.md W3)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "value", "ts", "event_id")
    hi = latest_per_key(ev, ["user_id"], "value", tiebreak=[]).select(
        "user_id", F.col("value").alias("high_value"), F.col("ts").alias("high_ts")
    )
    # latest_per_key orders desc only; for full tie-break parity use windows
    w_hi = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    w_lo = Window.partitionBy("user_id").orderBy(
        F.col("value").asc(), F.col("ts").asc(), F.col("event_id").asc()
    )
    hi = (
        ev.withColumn("rn", F.row_number().over(w_hi))
        .filter("rn = 1")
        .select(
            "user_id",
            F.col("value").alias("high_value"),
            F.col("ts").cast("date").alias("high_date"),
        )
    )
    lo = (
        ev.withColumn("rn", F.row_number().over(w_lo))
        .filter("rn = 1")
        .select(
            "user_id",
            F.col("value").alias("low_value"),
            F.col("ts").cast("date").alias("low_date"),
        )
    )
    return hi.join(lo, on="user_id")


# --------------------------------------------------------------------------
# Scalar function layer (SURVEY.md F1-F30)
# --------------------------------------------------------------------------


@register(
    "q_regex_extract",
    oracle="""
    SELECT c_custkey,
           regexp_extract(c_name, '([A-Za-z]+)#([0-9]+)', 1) AS name_part,
           CAST(regexp_extract(c_name, '([A-Za-z]+)#([0-9]+)', 2) AS BIGINT) AS num_part
    FROM customer
    """,
)
def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-group regex decode, as the OCC symbol parse (reference:
    transform-load.rkt:49-56)."""
    c = _t(spark, sf_dir, "customer")
    pat = "([A-Za-z]+)#([0-9]+)"
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", pat, 1).alias("name_part"),
        F.regexp_extract("c_name", pat, 2).cast("bigint").alias("num_part"),
    )


@register(
    "q_decimal_scale",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(0.001 AS DECIMAL(6,3)) AS DECIMAL(18,5)) AS VARCHAR) AS price_milli,
           CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.125 AS DECIMAL(6,4)) AS DECIMAL(18,6)) AS VARCHAR) AS target_1125
    FROM lineitem
    """,
)
def q_decimal_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-decimal scaling: the strike /1000 decode and the rational
    strike-target multiply (reference: transform-load.rkt:70;
    transform-load.2025-08-19.rkt:114-122; SURVEY.md F2/F20)."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (price * F.lit(Decimal("0.001")).cast("decimal(6,3)"))
        .cast("decimal(18,5)")
        .cast("string")
        .alias("price_milli"),
        (price * F.lit(Decimal("1.125")).cast("decimal(6,4)"))
        .cast("decimal(18,6)")
        .cast("string")
        .alias("target_1125"),
    )


@register(
    "q_pct_decode",
    oracle="""
    SELECT p_partkey,
           CAST(CAST(CAST(regexp_replace(CONCAT('1,2', CAST(p_size AS VARCHAR), '%'),
                                         '[,%]', '', 'g') AS DECIMAL(28,6))
                     * CAST(0.01 AS DECIMAL(4,2)) AS DECIMAL(18,6)) AS VARCHAR) AS pct_value
    FROM part
    """,
)
def q_pct_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent/comma strip + /100 decode (reference:
    transform-load.2025-08-19.rkt:398-417,203; SURVEY.md F3/F4)."""
    from oic_options_chains_spark.functions.cleaning import pct_decode

    p = _t(spark, sf_dir, "part")
    raw = F.concat(F.lit("1,2"), F.col("p_size").cast("string"), F.lit("%"))
    return p.select("p_partkey", pct_decode(raw).cast("string").alias("pct_value"))


@register(
    "q_split_pair",
    oracle="""
    SELECT event_id,
           split_part(pair_str, ' - ', 1) AS value_part,
           split_part(pair_str, ' - ', 2) AS date_part
    FROM (SELECT event_id,
                 CONCAT(CAST(CAST(value AS DECIMAL(10,2)) AS VARCHAR), '% - ',
                        strftime(ts, '%d-%b')) AS pair_str
          FROM events)
    """,
)
def q_split_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split(' - ') pair decode of 'value% - dd-MMM' cells (reference:
    transform-load.2025-08-19.rkt:264-282; SURVEY.md F6)."""
    ev = _t(spark, sf_dir, "events")
    pair = F.concat(
        F.col("value").cast("decimal(10,2)").cast("string"),
        F.lit("% - "),
        F.date_format("ts", "dd-MMM"),
    )
    parts = F.split(pair, " - ")
    return ev.select(
        "event_id",
        parts.getItem(0).alias("value_part"),
        parts.getItem(1).alias("date_part"),
    )


@register(
    "q_enum_map",
    oracle="""
    SELECT o_orderkey,
           CASE o_orderstatus WHEN 'O' THEN 'Open' WHEN 'F' THEN 'Finished'
                WHEN 'P' THEN 'Pending' ELSE o_orderstatus END AS status_label
    FROM orders
    """,
)
def q_enum_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code -> label enum map ('C'->'Call'; BRKB->BRK.B aliases)
    (reference: transform-load.2025-08-19.rkt:195-198;
    weeklies-transform-load.rkt:65-68; SURVEY.md F25/F10)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        enum_map(
            F.col("o_orderstatus"),
            {"O": "Open", "F": "Finished", "P": "Pending"},
        ).alias("status_label"),
    )


@register(
    "q_date_parse",
    oracle="""
    SELECT o_orderkey,
           CAST(strptime(strftime(o_orderdate, '%Y%m%d'), '%Y%m%d') AS DATE) AS roundtrip_ymd,
           CAST(strptime(strftime(o_orderdate, '%d-%b-%Y'), '%d-%b-%Y') AS DATE) AS roundtrip_dmy
    FROM orders
    """,
)
def q_date_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date format/parse round-trips: yyyyMMdd (OCC expiry) and dd-MMM-yyyy
    (vol history dates) (reference: transform-load.rkt:69,134-137;
    SURVEY.md F12/F13/F14)."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.to_date(F.date_format("o_orderdate", "yyyyMMdd"), "yyyyMMdd").alias(
            "roundtrip_ymd"
        ),
        F.to_date(F.date_format("o_orderdate", "dd-MMM-yyyy"), "dd-MMM-yyyy").alias(
            "roundtrip_dmy"
        ),
    )


PRIOR_YEAR_SNAPSHOT = dt.date(2024, 1, 15)


@register(
    "q_prior_year",
    oracle="""
    WITH s AS (
      SELECT event_id,
             regexp_replace(strftime(ts, '%d-%b'), '^29-Feb$', '28-Feb') AS day_month
      FROM events),
    c AS (
      SELECT event_id, day_month,
             CAST(strptime(day_month || '-2024', '%d-%b-%Y') AS DATE) AS cand_this,
             CAST(strptime(day_month || '-2023', '%d-%b-%Y') AS DATE) AS cand_prior
      FROM s)
    SELECT event_id, day_month,
           CASE WHEN cand_this <= DATE '2024-01-15' THEN cand_this
                ELSE cand_prior END AS resolved_date
    FROM c
    """,
)
def q_prior_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prior-year date inference for year-less 'dd-MMM' strings, incl. the
    29-Feb hack (reference: transform-load.2025-08-19.rkt:228-240;
    SURVEY.md F17/F18)."""
    ev = _t(spark, sf_dir, "events")
    dm = F.regexp_replace(F.date_format("ts", "dd-MMM"), "^29-Feb$", "28-Feb")
    return ev.select(
        "event_id",
        dm.alias("day_month"),
        prior_year_date(dm, F.lit(PRIOR_YEAR_SNAPSHOT)).alias("resolved_date"),
    )


@register(
    "q_trunc_decimal",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(trunc(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(-0.0123 AS DECIMAL(6,4)) * 10000) / 10000
                     AS DECIMAL(38,4)) AS VARCHAR) AS theta_trunc,
           CAST(CAST(trunc(CAST(l_extendedprice AS DECIMAL(18,2))
                           * CAST(0.0123 AS DECIMAL(6,4)) * 10000) / 10000
                     AS DECIMAL(38,4)) AS VARCHAR) AS vega_trunc
    FROM lineitem
    """,
)
def q_trunc_decimal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trunc-toward-zero at 4 decimals on positive AND negative values —
    negative thetas must truncate up (reference:
    transform-load.2025-08-19.rkt:204-208; SURVEY.md F22)."""
    li = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    neg = price * F.lit(Decimal("-0.0123")).cast("decimal(6,4)")
    pos = price * F.lit(Decimal("0.0123")).cast("decimal(6,4)")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        trunc_n(neg, 4, "decimal(38,4)").cast("string").alias("theta_trunc"),
        trunc_n(pos, 4, "decimal(38,4)").cast("string").alias("vega_trunc"),
    )


@register(
    "q_try_cast",
    oracle="""
    SELECT p_partkey,
           TRY_CAST(CASE WHEN p_size % 3 = 0 THEN p_name
                         ELSE CAST(p_size AS VARCHAR) END AS INTEGER) AS parsed_size
    FROM part
    """,
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-on-garbage numeric parse (reference: transform-load.rkt:72-79;
    SURVEY.md F23)."""
    p = _t(spark, sf_dir, "part")
    raw = F.when(F.col("p_size") % 3 == 0, F.col("p_name")).otherwise(
        F.col("p_size").cast("string")
    )
    return p.select("p_partkey", raw.try_cast("int").alias("parsed_size"))


@register(
    "q_null_sentinel",
    oracle="""
    WITH raw AS (
      SELECT p_partkey,
             CASE WHEN p_size % 7 = 0 THEN 'N/A'
                  WHEN p_size % 7 = 1 THEN '0.00'
                  ELSE CAST(p_size AS VARCHAR) END AS sent
      FROM part)
    SELECT p_partkey,
           CASE WHEN sent IN ('N/A', '0.00') THEN NULL ELSE sent END AS cleaned,
           CAST(CAST(CASE WHEN sent IN ('N/A', '0.00') THEN NULL ELSE sent END
                     AS DECIMAL(10,2)) AS VARCHAR) AS cleaned_num
    FROM raw
    """,
)
def q_null_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentinel text -> NULL normalization (reference:
    transform-load.2025-08-19.rkt:327-393; SURVEY.md F24)."""
    p = _t(spark, sf_dir, "part")
    sent = (
        F.when(F.col("p_size") % 7 == 0, F.lit("N/A"))
        .when(F.col("p_size") % 7 == 1, F.lit("0.00"))
        .otherwise(F.col("p_size").cast("string"))
    )
    cleaned = sentinel_to_null(sent)
    return p.select(
        "p_partkey",
        cleaned.alias("cleaned"),
        cleaned.cast("decimal(10,2)").cast("string").alias("cleaned_num"),
    )


@register(
    "q_explode_sides",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'Call' AS side,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS px
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'Put' AS side,
           CAST(CAST(l_tax AS DECIMAL(18,2)) AS VARCHAR) AS px
    FROM lineitem
    """,
)
def q_explode_sides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide -> long unpivot: one JSON strike row becomes a Call and a Put row
    (reference: transform-load.2025-08-19.rkt:128-142; SURVEY.md F29/F28)."""
    li = _t(spark, sf_dir, "lineitem")
    sides = F.array(
        F.struct(
            F.lit("Call").alias("side"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("px"),
        ),
        F.struct(
            F.lit("Put").alias("side"),
            F.col("l_tax").cast("decimal(18,2)").alias("px"),
        ),
    )
    return li.select(
        "l_orderkey", "l_linenumber", F.explode(sides).alias("s")
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.col("s.side").alias("side"),
        F.col("s.px").cast("string").alias("px"),
    )


@register(
    "q_scan_json",
    oracle="""
    SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_value
    FROM events
    """,
)
def q_scan_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field access post-parse (reference:
    transform-load.2025-08-19.rkt:129-142,171; SURVEY.md S2/F30)."""
    ev = _t(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k bigint")
    return ev.select("event_id", parsed.getField("k").alias("k_value"))


@register(
    "q_scan_csv",
    oracle="""
    SELECT c_custkey,
           trim(split_part(line, ',', 2)) AS field_name,
           trim(split_part(line, ',', 3)) AS field_segment
    FROM (SELECT c_custkey,
                 CONCAT(CAST(c_custkey AS VARCHAR), ' , ', c_name, ' , ', c_mktsegment) AS line
          FROM customer)
    """,
)
def q_scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV line split + trim (reference: weeklies-transform-load.rkt:44-46;
    SURVEY.md S3/F7)."""
    c = _t(spark, sf_dir, "customer")
    line = F.concat(
        F.col("c_custkey").cast("string"),
        F.lit(" , "),
        F.col("c_name"),
        F.lit(" , "),
        F.col("c_mktsegment"),
    )
    parts = F.split(line, ",")
    return c.select(
        "c_custkey",
        F.trim(parts.getItem(1)).alias("field_name"),
        F.trim(parts.getItem(2)).alias("field_segment"),
    )


@register(
    "q_chain_build",
    oracle="""
    WITH marks AS (
      SELECT symbol_key, mark_price FROM (
        SELECT o_custkey AS symbol_key,
               CAST(o_totalprice AS DECIMAL(18,2)) AS mark_price,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        FROM orders WHERE o_orderdate <= TIMESTAMP '1998-06-30 00:00:00')
      WHERE rn = 1),
    targets AS (SELECT unnest([DATE '1998-07-14', DATE '1998-07-28',
                               DATE '1998-08-11', DATE '1998-08-25']) AS target_date),
    dates AS (SELECT DISTINCT CAST(l_shipdate AS DATE) AS expiry FROM lineitem),
    expiry_winners AS (
      SELECT DISTINCT expiry FROM (
        SELECT t.target_date, d.expiry,
               row_number() OVER (PARTITION BY t.target_date
                                  ORDER BY abs(date_diff('day', t.target_date, d.expiry)),
                                           d.expiry) AS rn
        FROM dates d CROSS JOIN targets t) WHERE rn = 1),
    mults AS (SELECT CAST(unnest(['0.70','0.825','1.00','1.125','1.30'])
                     AS DECIMAL(6,4)) AS mult),
    strike_targets AS (
      SELECT DISTINCT symbol_key % 100 AS symbol_key,
             CAST(round((mark_price * mult) % CAST(50.00 AS DECIMAL(10,2)), 2)
                  AS DECIMAL(10,2)) AS target_strike
      FROM marks CROSS JOIN mults),
    chains AS (
      SELECT l_suppkey % 100 AS symbol_key, w.expiry,
             CAST(l_quantity AS DECIMAL(10,2)) AS strike,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS bid,
             CAST(l_tax AS DECIMAL(18,2)) AS ask
      FROM lineitem JOIN expiry_winners w ON CAST(l_shipdate AS DATE) = w.expiry),
    strikes AS (SELECT DISTINCT symbol_key, expiry, strike FROM chains),
    winners AS (
      SELECT DISTINCT symbol_key, expiry, strike AS win_strike FROM (
        SELECT s.symbol_key, s.expiry, s.strike,
               row_number() OVER (PARTITION BY s.symbol_key, s.expiry, t.target_strike
                                  ORDER BY abs(s.strike - t.target_strike), s.strike) AS rn
        FROM strikes s JOIN strike_targets t ON s.symbol_key = t.symbol_key)
      WHERE rn = 1),
    kept AS (
      SELECT c.symbol_key, c.expiry, c.strike, c.bid, c.ask
      FROM chains c JOIN winners w
        ON c.symbol_key = w.symbol_key AND c.expiry = w.expiry
       AND c.strike = w.win_strike),
    long AS (
      SELECT symbol_key, expiry, strike, 'Call' AS call_put, bid AS px FROM kept
      UNION ALL
      SELECT symbol_key, expiry, strike, 'Put' AS call_put, ask AS px FROM kept)
    SELECT symbol_key, expiry, CAST(strike AS VARCHAR) AS strike, call_put,
           CAST(MIN(px) AS VARCHAR) AS px
    FROM long GROUP BY symbol_key, expiry, strike, call_put
    """,
)
def q_chain_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FLAGSHIP composite (pipelines/chains.build_chain, SURVEY.md
    section 3.2 end-to-end): as-of mark price -> exact-decimal strike and
    expiry targets -> nearest-expiry/nearest-strike selection -> side
    explode -> PK resolution — the whole daily transform, hash-checked as
    one plan. Deterministic mode resolves PK collisions with min(px)
    (the reference's PK index kept an arbitrary first-arrival)."""
    from oic_options_chains_spark.pipelines.chains import build_chain

    # build_chain keeps native decimal types for downstream consumers; the
    # registered query stringifies the decimal outputs for the cross-engine
    # value hash (scale-pinned rendering is identical on both engines).
    return build_chain(spark, sf_dir, deterministic=True).select(
        "symbol_key",
        "expiry",
        F.col("strike").cast("string").alias("strike"),
        "call_put",
        F.col("px").cast("string").alias("px"),
    )


@register(
    "q_kmv_distinct",
    oracle="""
    WITH v AS (
      SELECT DISTINCT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS s
      FROM lineitem),
    f AS (
      SELECT CAST(concat('0x', substr(md5(s), 1, 13)) AS BIGINT)
             / 4503599627370496.0 AS f
      FROM v ORDER BY 1 LIMIT 64),
    a AS (SELECT COUNT(*) AS n_minima, MAX(f) AS m FROM f)
    SELECT CAST(n_minima AS BIGINT) AS n_minima,
           CAST(CASE WHEN n_minima < 64 THEN n_minima
                     ELSE CAST(283726776524341248 AS BIGINT)
                          // CAST(m * CAST(4503599627370496 AS DOUBLE) AS BIGINT)
                END AS BIGINT) AS estimate
    FROM a
    """,
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic distinct-count sketch (operators/sketches): k=64
    minimum md5 fractions of the distinct price strings -> (k-1)/m
    estimator. Unlike HLL approx_count_distinct, every engine computes
    the identical estimate, so it is oracle-checkable."""
    from oic_options_chains_spark.operators.sketches import kmv_distinct_estimate

    li = _t(spark, sf_dir, "lineitem")
    priced = li.select(
        F.col("l_extendedprice").cast("decimal(18,2)").cast("string").alias("price_s")
    )
    return kmv_distinct_estimate(priced, "price_s", k=64)


@register(
    "q_interval_join",
    oracle="""
    WITH iv AS (
      SELECT o_custkey % 40 AS grp,
             MIN(CAST(o_orderdate AS DATE)) AS start_date,
             MAX(CAST(o_orderdate AS DATE)) AS end_date
      FROM orders GROUP BY 1),
    p AS (SELECT DISTINCT CAST(l_shipdate AS DATE) AS ship_date FROM lineitem)
    SELECT p.ship_date, iv.grp, iv.start_date, iv.end_date
    FROM p JOIN iv ON p.ship_date BETWEEN iv.start_date AND iv.end_date
    """,
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval range join via the bucketed equi-join strategy
    (operators/rangejoin.interval_join): intervals explode into month
    buckets, points equi-join on their bucket, exact bounds filter after.
    Never |points| x |intervals| — the non-equi join Spark would
    otherwise plan as a nested loop."""
    from oic_options_chains_spark.operators.rangejoin import interval_join

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    intervals = o.groupBy((F.col("o_custkey") % 40).alias("grp")).agg(
        F.min(F.col("o_orderdate").cast("date")).alias("start_date"),
        F.max(F.col("o_orderdate").cast("date")).alias("end_date"),
    )
    points = li.select(F.col("l_shipdate").cast("date").alias("ship_date")).distinct()
    return interval_join(
        points, "ship_date", intervals, "start_date", "end_date"
    ).select("ship_date", "grp", "start_date", "end_date")


@register(
    "q_chain_all_options",
    oracle="""
    WITH kept AS (
      SELECT l_suppkey % 100 AS symbol_key,
             CAST(l_shipdate AS DATE) AS expiry,
             CAST(l_quantity AS DECIMAL(10,2)) AS strike,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS bid,
             CAST(l_tax AS DECIMAL(18,2)) AS ask
      FROM lineitem),
    long AS (
      SELECT symbol_key, expiry, strike, 'Call' AS call_put, bid AS px FROM kept
      UNION ALL
      SELECT symbol_key, expiry, strike, 'Put' AS call_put, ask AS px FROM kept)
    SELECT symbol_key, expiry, CAST(strike AS VARCHAR) AS strike, call_put,
           CAST(MIN(px) AS VARCHAR) AS px
    FROM long GROUP BY symbol_key, expiry, strike, call_put
    """,
)
def q_chain_all_options(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The --all-options passthrough (reference:
    transform-load.2025-08-19.rkt:147-152): nearest-selection skipped,
    every raw chain row explodes into both sides and flows to PK
    resolution. Same final-decimal stringification as q_chain_build."""
    from oic_options_chains_spark.pipelines.chains import build_chain

    return build_chain(spark, sf_dir, deterministic=True, all_options=True).select(
        "symbol_key",
        "expiry",
        F.col("strike").cast("string").alias("strike"),
        "call_put",
        F.col("px").cast("string").alias("px"),
    )


@register(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS VARCHAR) AS sum_qty,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup with grouping indicators — the OLAP surface the
    reference lacks and Spark provides natively (SURVEY.md section 2.4
    'absent in reference'). Partial aggregation still applies per
    grouping set; quantities summed as decimals for engine-portable
    totals."""
    li = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("decimal(38,2)")
        .cast("string")
        .alias("sum_qty"),
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
    ).select(
        "l_returnflag", "l_linestatus", "n", "sum_qty", "g_flag", "g_status"
    )


@register(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(grouping(l_returnflag) AS INT) AS g_flag,
           CAST(grouping(l_linestatus) AS INT) AS g_status
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^k grouping sets in one pass (completes the grouping-
    sets family next to q_rollup's hierarchy) — one scan expands into the
    grouping-set union with partial aggregation intact per set."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.grouping("l_returnflag").cast("int").alias("g_flag"),
            F.grouping("l_linestatus").cast("int").alias("g_status"),
        )
        .select("l_returnflag", "l_linestatus", "n", "g_flag", "g_status")
    )


@register(
    "q_intersect_except",
    oracle="""
    WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
    supp_nations AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier),
    both_sides AS (SELECT nationkey FROM cust_nations
                   INTERSECT SELECT nationkey FROM supp_nations),
    cust_only AS (SELECT nationkey FROM cust_nations
                  EXCEPT SELECT nationkey FROM supp_nations)
    SELECT nationkey, 'both' AS presence FROM both_sides
    UNION ALL
    SELECT nationkey, 'customer_only' AS presence FROM cust_only
    """,
)
def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations (absent in the reference,
    SURVEY.md section 2.7 — standard surface the engine carries anyway).
    Both plan as hash aggregates + semi/anti joins."""
    cust = (
        _t(spark, sf_dir, "customer")
        .select(F.col("c_nationkey").alias("nationkey"))
        .distinct()
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .select(F.col("s_nationkey").alias("nationkey"))
        .distinct()
    )
    both_sides = cust.intersect(supp).withColumn("presence", F.lit("both"))
    cust_only = cust.exceptAll(supp).withColumn(
        "presence", F.lit("customer_only")
    )
    return both_sides.unionAll(cust_only)


@register(
    "q_pivot",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) FILTER (WHERE l_linestatus = 'F') AS BIGINT) AS n_f,
           CAST(COUNT(*) FILTER (WHERE l_linestatus = 'O') AS BIGINT) AS n_o,
           CAST(CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                              FILTER (WHERE l_linestatus = 'F'), 0) AS DECIMAL(38,2)) AS VARCHAR) AS qty_f,
           CAST(CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                              FILTER (WHERE l_linestatus = 'O'), 0) AS DECIMAL(38,2)) AS VARCHAR) AS qty_o
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide pivot by status — expressed as conditional aggregation (the
    plan ``pivot()`` lowers to anyway: one pass, no per-value scans)."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")

    def for_status(s: str):
        cond = F.col("l_linestatus") == s
        return [
            F.count(F.when(cond, 1)).alias(f"n_{s.lower()}"),
            F.coalesce(F.sum(F.when(cond, qty)), F.lit(0))
            .cast("decimal(38,2)")
            .cast("string")
            .alias(f"qty_{s.lower()}"),
        ]

    aggs = for_status("F") + for_status("O")
    out = li.groupBy("l_returnflag").agg(*aggs)
    return out.select("l_returnflag", "n_f", "n_o", "qty_f", "qty_o")
