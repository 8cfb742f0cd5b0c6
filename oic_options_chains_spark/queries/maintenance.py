"""Warehouse-maintenance t2 queries: SCD2 history build, small-file
compaction planning, sketch-based join-overlap estimation, and
positional posting lists.

These are the table-keeping operations around the engine proper: the
reference's Dolt-versioned sink implies the SCD2 derivation, its per-day
partition layout implies compaction, and the curation surface
(decontamination, retrieval) implies overlap probes and inverted-index
postings. Every decision path is integer/string-exact, in the
post-round-3 discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.cdc import scd2_history
from oic_options_chains_spark.operators.layout import (
    compaction_bins,
    compaction_plan,
)
from oic_options_chains_spark.operators.ranking import posting_lists
from oic_options_chains_spark.operators.sketches import (
    hll_intersect_estimate,
    hll_linear_table,
    hll_numerator,
)
from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table

_HLL_NUM_256_M = str(hll_numerator(256))
_HLL_TABLE_256_M = ", ".join(str(x) for x in hll_linear_table(256))


@register(
    "q_scd2_history",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM o),
    g AS (
      SELECT user_id, run, MIN(event_type) AS event_type,
             MIN(ts) AS effective_from,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM r GROUP BY 1, 2)
    SELECT user_id, event_type, effective_from,
           lead(effective_from) OVER (PARTITION BY user_id ORDER BY run)
             AS effective_to,
           n_rows, CAST(run AS BIGINT) AS version
    FROM g
    """,
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 validity intervals from the event feed: each user's
    consecutive runs of the same event_type collapse to one row with
    [effective_from, effective_to) edges (open-ended on the current
    run). Gaps-and-islands over ONE exchange on user_id — both windows
    and the island aggregate share the same partitioning, so Spark
    plans a single shuffle however large the feed is."""
    e = load_table(spark, sf_dir, "events")
    return scd2_history(e, key="user_id", attr="event_type", ts="ts", tiebreak="event_id")


_COMPACT_TARGET = 2_000


@register(
    "q_compaction_plan",
    oracle=f"""
    WITH f AS (
      SELECT source AS part, doc_id AS file, CAST(n_chars AS BIGINT) AS size,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents)
    SELECT part, file, size,
           CAST((cum - size) // {_COMPACT_TARGET} AS BIGINT) AS bin,
           CAST(cum AS BIGINT) AS cum_bytes
    FROM f
    """,
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compaction assignment over the documents manifest (source =
    partition, doc = file, n_chars = bytes): next-fit bins of ~2 KB by
    running size. One window per PARTITION key — the same shape that
    plans OPTIMIZE over a million-file table, because the running sum
    never crosses partition boundaries."""
    d = load_table(spark, sf_dir, "documents")
    return compaction_plan(
        d, part_col="source", file_col="doc_id", size_col="n_chars",
        target_bytes=_COMPACT_TARGET,
    )


@register(
    "q_compaction_bins",
    oracle=f"""
    WITH f AS (
      SELECT source AS part, doc_id AS file, CAST(n_chars AS BIGINT) AS size,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents),
    p AS (
      SELECT part, file, size,
             CAST((cum - size) // {_COMPACT_TARGET} AS BIGINT) AS bin
      FROM f)
    SELECT part, bin, CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(SUM(size) AS BIGINT) AS bin_bytes,
           MIN(file) AS first_file, MAX(file) AS last_file
    FROM p GROUP BY 1, 2
    """,
)
def q_compaction_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rewrite work-list: per (partition, bin) file count, byte
    total, and file range — what the compactor schedules (and skips
    when n_files = 1). Reuses the plan's exchange: the rollup keys on
    the same partition column."""
    d = load_table(spark, sf_dir, "documents")
    plan = compaction_plan(
        d, part_col="source", file_col="doc_id", size_col="n_chars",
        target_bytes=_COMPACT_TARGET,
    )
    return compaction_bins(plan)


def _hll_reg_cte(tag: str, select_sql: str, b: int = 8) -> str:
    """Register-relation CTE block (m_{tag} as (reg, rho)) for one key
    set — mirrors operators/sketches.hll_registers."""
    hx = b // 4
    return f"""
    h_{tag} AS (SELECT md5(CAST(x AS VARCHAR)) AS h
                FROM ({select_sql}) s(x) GROUP BY 1),
    r_{tag} AS (SELECT CAST(concat('0x', substring(h, 1, {hx})) AS INT) AS reg,
                       CAST(concat('0x', substring(h, {hx + 1}, 13)) AS BIGINT) AS v
                FROM h_{tag}),
    m_{tag} AS (SELECT reg, MAX(IF(v = 0, 53, 53 - length(bin(v)))) AS rho
                FROM r_{tag} GROUP BY reg)"""


def _hll_est_cte(tag: str, reg_rel: str, b: int = 8) -> str:
    """Estimate CTE block (est_{tag} as one row (est)) from a (reg, rho)
    relation — mirrors operators/sketches.hll_estimate_from_registers."""
    m = 1 << b
    num = hll_numerator(m)
    table = ", ".join(str(x) for x in hll_linear_table(m))
    return f"""
    s_{tag} AS (SELECT COUNT(*) AS n_regs,
                       SUM((CAST(1 AS BIGINT) << (53 - rho))) AS t
                FROM {reg_rel}),
    e_{tag} AS (SELECT CAST({m} - n_regs AS BIGINT) AS nz,
                       CAST(CAST('{num}' AS HUGEINT)
                            // CAST(t + (CAST(1 AS BIGINT) << 53) * ({m} - n_regs)
                                    AS HUGEINT) AS BIGINT) AS raw_est
                FROM s_{tag}),
    est_{tag} AS (SELECT CAST(IF(raw_est <= {(5 * m) // 2} AND nz > 0,
                                 ([{table}])[CAST(nz AS INT)],
                                 raw_est) AS BIGINT) AS est
                  FROM e_{tag})"""


@register(
    "q_hll_intersect",
    oracle="WITH "
    + _hll_reg_cte("l", "SELECT o_custkey FROM orders")
    + ","
    + _hll_reg_cte("r", "SELECT c_custkey FROM customer")
    + """,
    m_u AS (SELECT reg, MAX(rho) AS rho FROM
              (SELECT * FROM m_l UNION ALL SELECT * FROM m_r)
            GROUP BY reg),"""
    + _hll_est_cte("le", "m_l")
    + ","
    + _hll_est_cte("re", "m_r")
    + ","
    + _hll_est_cte("ue", "m_u")
    + """
    SELECT l.est AS est_left, r.est AS est_right, u.est AS est_union,
           CAST(l.est + r.est - u.est AS BIGINT) AS est_intersect
    FROM est_le l CROSS JOIN est_re r CROSS JOIN est_ue u
    """,
)
def q_hll_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key overlap WITHOUT the join: HLL inclusion-exclusion over
    orders.o_custkey vs customer.c_custkey — the planner/debugging probe
    "how many customers actually ordered". Each side is one
    register-build scan; the union sketch is the MAX-merge of the two
    register relations, so the subtraction stays inside one sketch
    family and the whole answer is integer-exact."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return hll_intersect_estimate(o, "o_custkey", c, "c_custkey", b=8)


_PROBE_TERMS = ("table", "scan", "merge", "window")


@register(
    "q_posting_lists",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
    pos AS (SELECT doc_id, t[i + 1] AS term, CAST(i AS BIGINT) AS i
            FROM (SELECT doc_id, t, unnest(range(0, len(t))) AS i FROM toks)),
    hits AS (SELECT * FROM pos
             WHERE term IN ({", ".join(repr(t) for t in _PROBE_TERMS)}))
    SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf,
           string_agg(CAST(i AS VARCHAR), ',' ORDER BY i) AS positions
    FROM hits GROUP BY term, doc_id
    """,
)
def q_posting_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional postings for four probe terms: (term, doc, tf, sorted
    0-based positions as CSV) — the inverted-index rows phrase/proximity
    retrieval consumes. Probe list broadcast-filters before the
    aggregate, so only matching positions shuffle; the full-index build
    is the identical plan minus the semi-join."""
    d = load_table(spark, sf_dir, "documents")
    return posting_lists(d, list(_PROBE_TERMS))


@register(
    "q_skyline",
    # algorithm-independent oracle: weak-dominance NOT EXISTS over the
    # per-x maxima — the bucketed two-phase plan on the Spark side is
    # pruning only and cannot change the frontier
    oracle="""
    WITH toks AS (SELECT doc_id, n_chars,
                         string_split(lower(text), ' ') AS t
                  FROM documents),
    m AS (SELECT n_chars AS x,
                 CAST(1000000 * len(list_distinct(t)) AS BIGINT) // len(t) AS y
          FROM toks),
    counts AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM m GROUP BY 1, 2),
    byx AS (SELECT x, MAX(y) AS y, arg_max(cnt, y) AS n_rows
            FROM counts GROUP BY x)
    SELECT b.x AS n_chars, b.y AS diversity_e6, b.n_rows AS n_docs
    FROM byx b
    WHERE NOT EXISTS (SELECT 1 FROM byx o WHERE o.x > b.x AND o.y >= b.y)
    """,
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-vs-lexical-diversity Pareto frontier of the corpus: the
    documents no longer document also matches or beats in distinct-token
    ratio — the "best doc per length" curation skyline. The operator
    never sorts the data globally: per-x maxima (one aggregate), then
    domain-bounded x-buckets with a partitioned running max and a
    bucket-relation prefix max (operators/skyline.pareto_frontier)."""
    from oic_options_chains_spark.operators.skyline import pareto_frontier

    d = load_table(spark, sf_dir, "documents")
    diversity = F.expr(
        "CAST(1000000 * size(array_distinct(split(lower(text), ' '))) AS BIGINT)"
        " div size(split(lower(text), ' '))"
    )
    front = pareto_frontier(d, F.col("n_chars"), diversity, bucket_width=64)
    return front.select(
        F.col("x").alias("n_chars"),
        F.col("y").alias("diversity_e6"),
        F.col("n_rows").alias("n_docs"),
    )


@register(
    "q_skew_profile",
    oracle="""
    WITH c AS (SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM orders GROUP BY 1),
    t AS (SELECT SUM(cnt) AS total FROM c),
    top AS (SELECT key, cnt,
                   CAST(row_number() OVER (ORDER BY cnt DESC, key)
                        AS INT) AS rank
            FROM c ORDER BY cnt DESC, key LIMIT 20)
    SELECT p.key, p.cnt,
           CAST(FLOOR((CAST(10000 AS DOUBLE) * p.cnt) / t.total)
                AS BIGINT) AS share_bp,
           p.rank
    FROM top p CROSS JOIN t
    """,
)
def q_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 20 hottest order customers with their basis-point share of
    all orders (operators/layout.key_skew_profile) — the pre-shuffle
    skew diagnostic every join/agg key should pass before a 100 TB run;
    its output feeds the salting and AQE-skew decisions. Plans as
    TakeOrderedAndProject over the map-side-combined counts, rank over
    the 20 survivors only."""
    from oic_options_chains_spark.operators.layout import key_skew_profile

    o = load_table(spark, sf_dir, "orders")
    return key_skew_profile(o, "o_custkey", k=20)


@register(
    "q_table_stats",
    oracle="""
    WITH long AS (
      SELECT 'o_custkey' AS col, CAST(o_custkey AS VARCHAR) AS v FROM orders
      UNION ALL
      SELECT 'o_orderstatus', CAST(o_orderstatus AS VARCHAR) FROM orders
      UNION ALL
      SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR) FROM orders),
    counts AS (SELECT col, CAST(COUNT(*) AS BIGINT) AS n_rows,
                      CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END)
                           AS BIGINT) AS n_nulls
               FROM long GROUP BY 1),
    h AS (SELECT col, md5(v) AS h FROM long WHERE v IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT col, CAST(concat('0x', substring(h, 1, 2)) AS INT) AS reg,
                 CAST(concat('0x', substring(h, 3, 13)) AS BIGINT) AS vv
          FROM h),
    m AS (SELECT col, reg, MAX(IF(vv = 0, 53, 53 - length(bin(vv)))) AS rho
          FROM r GROUP BY col, reg),
    s AS (SELECT col, COUNT(*) AS n_regs,
                 SUM((CAST(1 AS BIGINT) << (53 - rho))) AS t
          FROM m GROUP BY col),
    e AS (SELECT col, CAST(256 - n_regs AS BIGINT) AS n_zero_regs,
                 CAST(CAST('{{NUM}}' AS HUGEINT)
                      // CAST(t + (CAST(1 AS BIGINT) << 53) * (256 - n_regs)
                              AS HUGEINT) AS BIGINT) AS raw_est
          FROM s)
    SELECT c.col, c.n_rows, c.n_nulls,
           CAST(IF(e.raw_est <= 640 AND e.n_zero_regs > 0,
                   ([{{TABLE}}])[CAST(e.n_zero_regs AS INT)],
                   e.raw_est) AS BIGINT) AS ndv_est
    FROM counts c JOIN e ON c.col = e.col
    """.replace("{{NUM}}", _HLL_NUM_256_M).replace("{{TABLE}}", _HLL_TABLE_256_M),
)
def q_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog statistics in ONE pass — the ANALYZE TABLE analog a CBO
    (or a data debugger) wants per column: row count, null count, and a
    portable HLL NDV estimate, computed by stacking the audited columns
    into a (col, value) long relation and running the shared per-group
    register path (operators/sketches.hll_group_registers). At 100 TB
    the stack explodes rows by #columns but every aggregate is map-side
    combined to <= cols x 256 register rows — stats cost one scan, not
    one scan per column."""
    from oic_options_chains_spark.operators.sketches import (
        hll_group_estimate,
        hll_group_registers,
    )

    o = load_table(spark, sf_dir, "orders")
    long = o.selectExpr(
        "stack(3, 'o_custkey', CAST(o_custkey AS STRING),"
        " 'o_orderstatus', CAST(o_orderstatus AS STRING),"
        " 'o_orderpriority', CAST(o_orderpriority AS STRING)) AS (col, v)"
    )
    counts = long.groupBy("col").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("v").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nulls"),
    )
    regs = hll_group_registers(
        long.filter(F.col("v").isNotNull()), "v", "col", b=8
    )
    est = hll_group_estimate(regs, b=8).select(
        F.col("grp").alias("col"), F.col("estimate").alias("ndv_est")
    )
    return counts.join(est, "col").select("col", "n_rows", "n_nulls", "ndv_est")


@register(
    "q_pit_join",
    oracle="""
    WITH o AS (
      SELECT user_id, event_type, ts, event_id,
             CASE WHEN lag(event_type) OVER w IS NULL
                    OR lag(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    r AS (
      SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS run
      FROM o),
    g AS (
      SELECT user_id, run, MIN(event_type) AS event_type,
             MIN(ts) AS effective_from
      FROM r GROUP BY 1, 2),
    dim AS (
      SELECT user_id, event_type AS regime_type, effective_from,
             lead(effective_from) OVER (PARTITION BY user_id ORDER BY run)
               AS effective_to,
             CAST(run AS BIGINT) AS version
      FROM g),
    fact AS (SELECT event_id, user_id, ts FROM events
             WHERE event_type = 'purchase')
    SELECT f.event_id, f.user_id, d.version, d.regime_type,
           d.effective_from
    FROM fact f JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.effective_from
     AND (d.effective_to IS NULL OR f.ts < d.effective_to)
    """,
)
def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: label every purchase with the SCD2 regime
    version valid AT its timestamp — the "query the warehouse as of t"
    semantics the reference's Dolt-versioned tables imply, expressed as
    a lookup against the gaps-and-islands validity intervals of
    operators/cdc.scd2_history. Because SCD2 intervals TILE each
    entity's timeline (effective_to IS the next version's
    effective_from; the last is open-ended), "the interval containing
    ts" equals "the greatest effective_from <= ts", so the plan is the
    union+sort+carry-forward as-of merge (asof.asof_join_union): one
    shuffle on the entity key, no per-key pair products. The naive
    equi+range join pays n_facts(u) * n_versions(u) candidates inside
    every user's partition — the Zipf twin measured it at 117x wall
    (one hot user holds a Zipf share of both sides); the merge form is
    linear per key however skewed the entities are. Equal-
    effective_from versions (regime flipped twice at one timestamp)
    resolve to the highest version — exactly the rows the half-open
    range form keeps, since the earlier same-instant interval is
    zero-length and unmatchable (equivalence property-tested:
    tests/test_round11_pit.py)."""
    from oic_options_chains_spark.operators.asof import asof_join_union

    e = load_table(spark, sf_dir, "events")
    dim = scd2_history(e, "user_id", "event_type", "ts", "event_id").select(
        "user_id",
        F.col("event_type").alias("regime_type"),
        "effective_from",
        "version",
        F.col("effective_from").alias("__rt"),
    )
    fact = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return asof_join_union(
        fact,
        dim,
        on=["user_id"],
        left_time="ts",
        right_time="__rt",
        tiebreak=("version",),
        how="inner",
    ).select("event_id", "user_id", "version", "regime_type", "effective_from")


@register(
    "q_value_recon",
    oracle="""
    WITH detail AS (
      -- ROUND, not FLOOR: prices are doubles holding exact cent values,
      -- so price*100 lands within an ulp of an integer — floor() drops
      -- a cent whenever the error is negative (979.98 -> 97997), round()
      -- recovers the exact integer on both engines
      SELECT l_orderkey AS okey,
             CAST(SUM(CAST(ROUND(CAST(l_extendedprice AS DOUBLE) * 100)
                           AS BIGINT)) AS BIGINT) AS detail_cents,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1),
    joined AS (
      SELECT o.o_orderstatus AS status,
             CAST(ROUND(CAST(o.o_totalprice AS DOUBLE) * 100)
                  AS BIGINT) AS header_cents,
             d.detail_cents, d.n_lines
      FROM orders o LEFT JOIN detail d ON o.o_orderkey = d.okey)
    SELECT status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN n_lines IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_orphan_headers,
           CAST(SUM(CASE WHEN n_lines IS NOT NULL
                          AND header_cents <> detail_cents
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_value_mismatch,
           CAST(SUM(CASE WHEN n_lines IS NOT NULL
                     THEN abs(header_cents - detail_cents) ELSE 0 END)
                AS BIGINT) AS abs_diff_cents
    FROM joined GROUP BY 1
    """,
)
def q_value_recon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-vs-detail VALUE reconciliation per order status — the
    double-entry audit the count reconciliation (A5, q_count_recon)
    implies for money columns: per status, how many orders have no
    detail rows at all, how many disagree between the header total and
    the summed line totals, and the absolute drift in exact cents. One
    map-side-combined detail rollup, one key-equi join, one final
    aggregate; every comparison is integer cents. Cents come from
    ROUND(price*100): the doubles hold exact cent values, so the product
    sits within an ulp of an integer and round() recovers it exactly on
    both engines — floor() would misreport a reconciling order by one
    cent per line whenever the representation error is negative."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(c.cast("double") * 100).cast("bigint")  # noqa: E731
    detail = li.groupBy(F.col("l_orderkey").alias("okey")).agg(
        F.sum(cents(F.col("l_extendedprice"))).cast("bigint").alias("detail_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )
    joined = o.join(detail, o["o_orderkey"] == detail["okey"], "left")
    return joined.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(F.col("n_lines").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_orphan_headers"),
        F.sum(
            F.when(
                F.col("n_lines").isNotNull()
                & (cents(F.col("o_totalprice")) != F.col("detail_cents")),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_value_mismatch"),
        F.sum(
            F.when(
                F.col("n_lines").isNotNull(),
                F.abs(cents(F.col("o_totalprice")) - F.col("detail_cents")),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("abs_diff_cents"),
    )


@register(
    "q_mad_outliers",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS g,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS x
      FROM lineitem),
    r AS (SELECT g, x,
                 row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
                 COUNT(*) OVER (PARTITION BY g) AS n
          FROM v),
    med AS (SELECT g, x AS median FROM r WHERE rn = (n + 1) // 2),
    d AS (SELECT v.g, v.x, m.median, ABS(v.x - m.median) AS dev
          FROM v JOIN med m ON v.g = m.g),
    r2 AS (SELECT g, dev,
                  row_number() OVER (PARTITION BY g ORDER BY dev) AS rn,
                  COUNT(*) OVER (PARTITION BY g) AS n
           FROM d),
    mad AS (SELECT g, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
    SELECT d.g AS l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(d.median) AS BIGINT) AS median,
           CAST(MIN(mad.mad) AS BIGINT) AS mad,
           CAST(SUM(CASE WHEN d.dev * 1000 > 5000 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN mad ON d.g = mad.g
    GROUP BY d.g
    """,
)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier screen per return-flag over
    cent-scaled prices (operators/robust.mad_outliers): the 50%-
    breakdown-point quality gate a corrupted 1e12 price cannot drag,
    unlike mean/stddev. Lower-median selection by row_number keeps both
    engines on the identical element (built-in median() interpolates on
    even counts and floats); the outlier test |x-med|*1000 > k_e3*MAD
    is pure integer arithmetic. Scaling goes through DECIMAL(18,2)
    before *100 — a double*100 cast would round differently per
    engine."""
    from oic_options_chains_spark.operators.robust import mad_outliers

    li = load_table(spark, sf_dir, "lineitem")
    cents = F.col("l_extendedprice").cast("decimal(18,2)") * 100
    return mad_outliers(
        li.select("l_returnflag", cents.alias("cents")),
        "l_returnflag",
        F.col("cents"),
        k_e3=5000,
    )


@register(
    "q_phrase_match",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
    pos AS (SELECT doc_id, t[i + 1] AS term, CAST(i AS BIGINT) AS i
            FROM (SELECT doc_id, t, unnest(range(0, len(t))) AS i FROM toks)),
    a AS (SELECT doc_id, i AS p0 FROM pos WHERE term = 'table'),
    b AS (SELECT doc_id, i - 1 AS p0 FROM pos WHERE term = 'hash')
    SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(a.p0) AS BIGINT) AS first_pos
    FROM a JOIN b ON a.doc_id = b.doc_id AND a.p0 = b.p0
    GROUP BY a.doc_id
    """,
)
def q_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval ('table hash') from positional postings
    (operators/ranking.phrase_match): broadcast probe filter, then an
    offset-aligned equi-join — term i must sit at p0+i — so proximity
    costs posting-list work, never a document re-scan. The postings-fetch
    counterpart of q_posting_lists."""
    from oic_options_chains_spark.operators.ranking import phrase_match

    d = load_table(spark, sf_dir, "documents")
    return phrase_match(d, ["table", "hash"])


@register(
    "q_impute",
    oracle="""
    WITH c AS (
      SELECT c_custkey, c_mktsegment,
             CASE WHEN c_custkey % 7 = 0 THEN NULL
                  ELSE CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
             END AS cents
      FROM customer),
    obs AS (SELECT c_mktsegment AS g, cents AS x FROM c
            WHERE cents IS NOT NULL),
    r AS (SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
                 COUNT(*) OVER (PARTITION BY g) AS n
          FROM obs),
    med AS (SELECT g, x AS med FROM r WHERE rn = (n + 1) // 2)
    SELECT c.c_custkey, c.c_mktsegment,
           CAST(COALESCE(c.cents, med.med) AS BIGINT) AS cents,
           CAST(CASE WHEN c.cents IS NULL AND med.med IS NOT NULL
                     THEN 1 ELSE 0 END AS INT) AS was_imputed
    FROM c LEFT JOIN med ON med.g = c.c_mktsegment
    """,
)
def q_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust feature repair (operators/robust.impute_group_median):
    every seventh customer's balance is masked NULL deterministically,
    then refilled with the market segment's lower-median of the OBSERVED
    balances — integer-exact via the q_mad_outliers median discipline,
    with a was_imputed audit flag. The median table is group-count-sized
    and broadcasts back; the corpus shuffles zero extra times."""
    from oic_options_chains_spark.operators.robust import impute_group_median

    c = load_table(spark, sf_dir, "customer")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
    masked = c.select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(cents)
        .alias("cents_raw"),
    )
    return impute_group_median(
        masked, "c_mktsegment", "cents_raw", out="cents"
    ).select("c_custkey", "c_mktsegment", "cents", "was_imputed")


@register(
    "q_cross_check",
    oracle="""
    WITH la AS (
      SELECT l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS n_lines,
             CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_f
      FROM lineitem GROUP BY 1),
    j AS (
      SELECT o.o_orderkey, o.o_orderstatus,
             COALESCE(la.n_lines, 0) AS n_lines,
             COALESCE(la.n_f, 0) AS n_f
      FROM orders o LEFT JOIN la ON la.l_orderkey = o.o_orderkey)
    SELECT 'order_has_lines' AS check,
           CAST(COUNT(*) AS BIGINT) AS n_applicable,
           CAST(SUM(CASE WHEN n_lines = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM j
    UNION ALL
    SELECT 'F_implies_all_lines_shipped',
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN o_orderstatus = 'F'
                          AND NOT (n_lines > 0 AND n_f = n_lines)
                         THEN 1 ELSE 0 END) AS BIGINT)
    FROM j
    UNION ALL
    SELECT 'O_implies_some_line_open',
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(SUM(CASE WHEN o_orderstatus = 'O'
                          AND NOT (n_f < n_lines) THEN 1 ELSE 0 END)
                AS BIGINT)
    FROM j
    """,
)
def q_cross_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table implication audit
    (operators/validate.implication_audit): TPC-H status semantics as
    conditional functional dependencies — a finalized ('F') order must
    have every line shipped, an open ('O') order must have an unshipped
    line, every order must have lines at all. One line-side aggregate
    joins the orders side; ALL rules fold into one conditional-agg pass.
    The report states whatever the data actually violates (the synthetic
    generator is not constraint-faithful — that is exactly what an audit
    is for)."""
    from oic_options_chains_spark.operators.validate import implication_audit

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    la = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        F.sum((F.col("l_linestatus") == "F").cast("int"))
        .cast("bigint")
        .alias("n_f"),
    )
    j = (
        o.select("o_orderkey", "o_orderstatus")
        .join(la, "o_orderkey", "left")
        .select(
            "o_orderstatus",
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            F.coalesce(F.col("n_f"), F.lit(0)).alias("n_f"),
        )
    )
    return implication_audit(
        j,
        {
            "order_has_lines": (F.lit(True), F.col("n_lines") > 0),
            "F_implies_all_lines_shipped": (
                F.col("o_orderstatus") == "F",
                (F.col("n_lines") > 0) & (F.col("n_f") == F.col("n_lines")),
            ),
            "O_implies_some_line_open": (
                F.col("o_orderstatus") == "O",
                F.col("n_f") < F.col("n_lines"),
            ),
        },
    )


@register(
    "q_winsorize",
    oracle="""
    WITH v AS (
      SELECT l_returnflag AS g,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
      FROM lineitem),
    r AS (SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS rn,
                 COUNT(*) OVER (PARTITION BY g) AS n
          FROM v),
    b AS (SELECT g,
                 MIN(CASE WHEN rn = greatest(1, CAST(ceil(n * 5 / 100.0)
                                                     AS BIGINT))
                          THEN x END) AS lo,
                 MAX(CASE WHEN rn = greatest(1, CAST(ceil(n * 95 / 100.0)
                                                     AS BIGINT))
                          THEN x END) AS hi
          FROM r GROUP BY g)
    SELECT v.g AS l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN v.x < b.lo THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_lo,
           CAST(SUM(CASE WHEN v.x > b.hi THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clipped_hi,
           CAST(MIN(b.lo) AS BIGINT) AS lo_bound,
           CAST(MIN(b.hi) AS BIGINT) AS hi_bound,
           CAST(SUM(greatest(least(v.x, b.hi), b.lo)) AS BIGINT)
             AS sum_winsorized
    FROM v JOIN b ON v.g = b.g
    GROUP BY v.g
    """,
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P95 winsorization of cent-scaled prices per return flag
    (operators/robust.winsorize): order-statistic boundaries (exact
    row_number selection, never interpolating percentile built-ins),
    clip counts, and the winsorized sum — the repair TRANSFORM next to
    q_mad_outliers' screen."""
    from oic_options_chains_spark.operators.robust import winsorize

    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    return winsorize(
        li.select("l_returnflag", cents.alias("cents")),
        "l_returnflag",
        "cents",
    )


@register(
    "q_ks_drift",
    oracle="""
    WITH v AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS g,
             CAST(len(text) AS BIGINT) AS x
      FROM documents),
    pv AS (SELECT x AS v,
                  CAST(SUM(CASE WHEN g = 'even' THEN 1 ELSE 0 END) AS BIGINT) AS a,
                  CAST(SUM(CASE WHEN g = 'odd' THEN 1 ELSE 0 END) AS BIGINT) AS b
           FROM v GROUP BY x),
    cum AS (SELECT v,
                   SUM(a) OVER (ORDER BY v) AS ca,
                   SUM(b) OVER (ORDER BY v) AS cb
            FROM pv),
    tot AS (SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b
            FROM pv),
    gap AS (SELECT t.n_a, t.n_b, c.v,
                   ABS(c.ca * t.n_b - c.cb * t.n_a) AS g
            FROM cum c CROSS JOIN tot t)
    SELECT n_a, n_b,
           CAST(MAX(g) AS BIGINT) AS d_num,
           CAST((SELECT MIN(v) FROM gap
                 WHERE g = (SELECT MAX(g) FROM gap)) AS BIGINT) AS at_value
    FROM gap GROUP BY n_a, n_b
    """,
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov drift statistic between the
    text-length distributions of the even/odd doc_id halves
    (operators/robust.ks_two_sample): D = d_num/(n_a*n_b), attained at
    ``at_value``. Integer-exact by cross-multiplied ECDF gaps over the
    distinct-value domain (step ECDFs reach their supremum at a jump,
    so the value-domain max IS the supremum); the single-partition
    cumulative window runs over |distinct lengths| rows, not |corpus|
    — the drift gate for 'did this crawl snapshot shift against the
    curated baseline' run before any shared quality threshold."""
    from oic_options_chains_spark.operators.robust import ks_two_sample

    d = load_table(spark, sf_dir, "documents")
    labeled = d.select(
        F.when(F.col("doc_id") % 2 == 0, F.lit("even"))
        .otherwise(F.lit("odd"))
        .alias("half"),
        F.length("text").cast("bigint").alias("text_len"),
    )
    return ks_two_sample(labeled, "half", "text_len", "even", "odd")
