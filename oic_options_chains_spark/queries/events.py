"""Event-stream t2 queries over the ``events`` table: the batch faces of
the streaming surface (SURVEY.md section 2.9) plus skew-safe aggregation.

The reference is batch+cron with no event-time operators; these are the
operations its Spark re-expression gains for free and a training-data
pipeline needs — tumbling-window rollups, gap sessionization, JSON
property access — each still DuckDB-oracle-checkable because the batch
semantics of an event-time window are plain SQL.

Determinism rules: monetary values are cast to decimal BEFORE summing
(double summation is order-dependent across engines); window orderings
carry ``event_id`` tie-breaks so ranks are stable under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table


@register(
    "q_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS VARCHAR) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window rollup via ``F.window`` — identical code
    under Structured Streaming with a watermark; in batch it is a plain
    grouped aggregate Catalyst turns into one partial+final hash agg."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .cast("string")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_sliding_window",
    oracle="""
    WITH b AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS s0, event_type,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events),
    x AS (
      SELECT s0 AS win_start, event_type, v FROM b
      UNION ALL
      SELECT s0 - INTERVAL '30 minutes' AS win_start, event_type, v FROM b)
    SELECT win_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(v) AS DECIMAL(28,2)) AS VARCHAR) AS total_value
    FROM x GROUP BY win_start, event_type
    """,
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 minutes: each event lands in two
    overlapping windows (the oracle expands the two start offsets
    explicitly). Under Structured Streaming the same expression runs with
    a watermark; in batch Catalyst plans the window expansion as a
    projection + one hash aggregate."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .cast("string")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@register(
    "q_session_gap",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0
             END AS new_session
      FROM ordered),
    numbered AS (
      SELECT user_id, ts, event_id,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged)
    SELECT user_id, CAST(session_idx AS INT) AS session_idx,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM numbered GROUP BY user_id, session_idx
    """,
)
def q_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessionization: the batch equivalent of a session
    window (lag -> boundary flag -> running sum -> per-session rollup).
    One shuffle on user_id serves both windows AND the final grouped
    aggregate — Catalyst reuses the partitioning. Gap comparison is in
    microseconds (a seconds cast would truncate sub-second gaps and
    disagree with the oracle's interval arithmetic)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us > 30 * 60 * 1_000_000), 1
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int")
        .alias("session_idx"),
    )
    return numbered.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@register(
    "q_json_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS prop_k
    FROM events
    """,
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property access on a string column (F30's general form)."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("prop_k"),
    )


@register(
    "q_salted_agg",
    oracle="""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS VARCHAR) AS total_value
    FROM events GROUP BY event_type
    """,
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregate: explicit salt -> partial agg on
    (key, salt) -> final agg on key. The oracle is the UNSALTED result —
    salting must never change answers, only the shuffle's key cardinality.
    (Spark's partial/final hash agg does this implicitly for commutative
    aggregates; the explicit form is the pattern for when a hot key must
    be split across reducers, e.g. a skewed join-side pre-agg.)"""
    e = load_table(spark, sf_dir, "events")
    salted = e.select(
        "event_type",
        (F.crc32(F.col("event_id").cast("string")) % 16).alias("__salt"),
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    partial = salted.groupBy("event_type", "__salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("v").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.sum("pv").cast("decimal(28,2)").cast("string").alias("total_value"),
    )


@register(
    "q_moving_avg",
    oracle="""
    SELECT event_id, user_id, ts,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2)))
                     OVER (PARTITION BY user_id ORDER BY ts
                           RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                     AS DECIMAL(28,2)) AS VARCHAR) AS rolling_1h_value
    FROM events
    """,
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame: per-user trailing-1-hour value sum (the
    frame-spec surface SURVEY.md section 2.5 reserves for W3). Long-typed
    epoch-seconds ordering expresses the interval range portably; decimal
    summation keeps the rolling total order-independent."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-(3600 * 1_000_000), 0)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("decimal(28,2)")
        .cast("string")
        .alias("rolling_1h_value"),
    )


@register(
    "q_rollup_refresh",
    oracle="""
    SELECT date_trunc('hour', ts) AS bucket_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS VARCHAR) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_rollup_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate refresh (operators/rollup): the stored hourly
    rollup of the first half of the stream, merged with the delta
    aggregate of the second half — the oracle is the FULL recompute, so
    the hash match proves incremental == batch. The monoid merge is what
    a cron'd refresh or a foreachBatch sink runs per cycle."""
    from oic_options_chains_spark.operators.rollup import refresh_rollup, rollup_delta

    e = load_table(spark, sf_dir, "events")
    split = F.lit("2024-02-01 00:00:00").cast("timestamp")
    stored = rollup_delta(e.filter(F.col("ts") < split))
    refreshed = refresh_rollup(stored, e.filter(F.col("ts") >= split))
    return refreshed.select(
        "bucket_start",
        "event_type",
        "n_events",
        F.col("total_value").cast("string").alias("total_value"),
    )


@register(
    "q_percentiles",
    oracle="""
    WITH r AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM events),
    p AS (SELECT unnest([50, 90, 99]) AS pct)
    SELECT r.event_type, CAST(p.pct AS INT) AS pct, r.value AS pct_value
    FROM r JOIN p ON r.rn = CAST(CEIL(p.pct * r.n / 100.0) AS BIGINT)
    """,
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (p50/p90/p99 per event type) with a
    pinned rank rule — rank ceil(p*n/100), id tie-break — because
    engine-native percentile functions disagree on interpolation.
    One window pass computes every requested percentile; the broadcast
    percentile list joins on the rank equality."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    ranked = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("event_type")).alias("n"),
    )
    pcts = spark.range(0).sparkSession.createDataFrame(
        [(50,), (90,), (99,)], "pct int"
    )
    return ranked.join(
        F.broadcast(pcts),
        on=F.col("rn")
        == F.ceil(F.col("pct") * F.col("n") / F.lit(100.0)).cast("bigint"),
    ).select("event_type", "pct", F.col("value").alias("pct_value"))


@register(
    "q_topk_per_group",
    oracle="""
    SELECT user_id, event_id, CAST(rnk AS INT) AS rnk FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY value DESC, event_id ASC) AS rnk
      FROM events)
    WHERE rnk <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic top-k per group (k=3 by value, id tie-break). Spark plans
    the rank filter as WindowGroupLimit — a per-partition running top-k
    that never materializes full groups."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        e.select("user_id", "event_id", F.row_number().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .select("user_id", "event_id", F.col("rnk").cast("int").alias("rnk"))
    )


@register(
    "q_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL 24 HOUR GROUP BY e.user_id),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        AND e.ts <= s2.t2 + INTERVAL 24 HOUR GROUP BY e.user_id),
    u AS (SELECT DISTINCT user_id FROM events),
    depths AS (
      SELECT u.user_id,
             CASE WHEN s3.user_id IS NOT NULL THEN 3
                  WHEN s2.user_id IS NOT NULL THEN 2
                  WHEN s1.user_id IS NOT NULL THEN 1
                  ELSE 0 END AS depth
      FROM u LEFT JOIN s1 ON u.user_id = s1.user_id
             LEFT JOIN s2 ON u.user_id = s2.user_id
             LEFT JOIN s3 ON u.user_id = s3.user_id),
    tot AS (SELECT COUNT(*) AS n_total FROM depths)
    SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(FLOOR(10000.0 * COUNT(*) / tot.n_total) AS BIGINT) AS share_bp
    FROM depths CROSS JOIN tot
    GROUP BY depth, tot.n_total
    """,
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (view -> click -> purchase): each step's
    earliest qualifying time must strictly follow the previous step's,
    within a 24-hour conversion window (interval arithmetic stays in
    exact microseconds on both engines). All three step aggregates and
    the joins key on user_id, so one hash partitioning serves the whole
    chain; the 4-row depth histogram with basis-point shares is the only
    global collapse."""
    e = load_table(spark, sf_dir, "events")
    day = F.expr("INTERVAL 24 HOURS")
    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= F.col("t1") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t2")) & (F.col("ts") <= F.col("t2") + day))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    u = e.select("user_id").distinct()
    depths = (
        u.join(s1.select("user_id", F.lit(1).alias("d1")), "user_id", "left")
        .join(s2.select("user_id", F.lit(1).alias("d2")), "user_id", "left")
        .join(s3.select("user_id", F.lit(1).alias("d3")), "user_id", "left")
        .select(
            F.when(F.col("d3").isNotNull(), 3)
            .when(F.col("d2").isNotNull(), 2)
            .when(F.col("d1").isNotNull(), 1)
            .otherwise(0)
            .alias("depth")
        )
    )
    tot = depths.agg(F.count(F.lit(1)).alias("n_total"))
    return (
        depths.groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .crossJoin(F.broadcast(tot))
        .select(
            "depth",
            F.col("n_users").cast("bigint").alias("n_users"),
            F.floor(
                F.lit(10000.0) * F.col("n_users") / F.col("n_total")
            )
            .cast("bigint")
            .alias("share_bp"),
        )
    )


@register(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id,
             CAST(date_trunc('week', ts) AS DATE) AS active_week
      FROM events),
    joined AS (
      SELECT f.cohort_week,
             CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS INT)
               AS week_offset,
             a.user_id
      FROM activity a JOIN firsts f ON a.user_id = f.user_id)
    SELECT cohort_week, week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM joined GROUP BY cohort_week, week_offset
    """,
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-seen ISO
    week, counted in each later week they return. Both engines truncate
    to ISO Monday, offsets are exact integer day arithmetic. The
    first-seen aggregate, the activity distinct, and their join all key
    on user_id — one partitioning, then a cohort-keyed rollup whose key
    space is weeks^2/2, tiny at any corpus size."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    activity = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    joined = activity.join(firsts, "user_id").select(
        "cohort_week",
        (F.datediff(F.col("active_week"), F.col("cohort_week")) / 7)
        .cast("int")
        .alias("week_offset"),
        "user_id",
    )
    return joined.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users")
    )


@register(
    "q_group_trend",
    oracle="""
    WITH pts AS (
      SELECT event_type AS grp,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             CAST(FLOOR(CAST(value AS DOUBLE) * 1000000) AS BIGINT) AS y
      FROM events),
    m AS (
      SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
             SUM(CAST(x AS HUGEINT) * y) AS sxy,
             SUM(CAST(x AS HUGEINT) * x) AS sxx
      FROM pts GROUP BY grp),
    nd AS (
      SELECT grp, n, sx, sy,
             n * sxy - sx * sy AS num, n * sxx - sx * sx AS den
      FROM m)
    SELECT grp AS event_type, n,
           CASE WHEN den = 0 THEN NULL
                ELSE CAST(num // den AS BIGINT) END AS slope,
           CASE WHEN den = 0 THEN NULL
                ELSE CAST((sy * den - num * sx) // (n * den) AS BIGINT)
           END AS intercept,
           CAST(den AS VARCHAR) AS den
    FROM nd
    """,
)
def q_group_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of value over time (micro-units per
    day), from integer power sums in ONE map-side-combined aggregate —
    the grouped drift detector (metric drift per source, quality drift
    per shard). Slope and intercept are integral divisions both engines
    truncate identically, incl. negatives (operators/trend.py); x is
    days since a fixed epoch, y is floor(value * 1e6)."""
    from oic_options_chains_spark.operators.trend import group_linear_trend

    e = load_table(spark, sf_dir, "events")
    out = group_linear_trend(
        e,
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")),
        F.floor(F.col("value").cast("double") * 1_000_000),
    )
    return out.select(
        F.col("grp").alias("event_type"), "n", "slope", "intercept", "den"
    )


@register(
    "q_concurrency",
    oracle="""
    WITH sweep AS (
      SELECT event_type AS grp, ts AS t, 1 AS delta, event_id AS id
      FROM events
      UNION ALL
      SELECT event_type, ts + INTERVAL 10 MINUTE, -1, event_id FROM events),
    runs AS (
      SELECT grp, t,
             CAST(SUM(delta) OVER (PARTITION BY grp ORDER BY t, delta, id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
      FROM sweep),
    m AS (SELECT grp, MAX(run) AS mx FROM runs GROUP BY 1)
    SELECT r.grp AS event_type, m.mx AS max_concurrent,
           MIN(r.t) AS first_peak_ts
    FROM runs r JOIN m ON r.grp = m.grp AND r.run = m.mx
    GROUP BY 1, 2
    """,
)
def q_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent 10-minute event windows per event type, plus the
    first instant the peak is reached — the interval sweep-line
    (operators/sweep.max_concurrency): ±1 boundary events, one
    group-keyed exchange, per-group running sum, and a join-free
    max(struct(run, -t)) peak fold. The oracle states the same sweep
    declaratively with a runs-to-max join, algorithm-independent of the
    struct-max trick."""
    from oic_options_chains_spark.operators.sweep import max_concurrency

    e = load_table(spark, sf_dir, "events")
    return max_concurrency(
        e,
        "event_type",
        F.col("ts"),
        F.col("ts") + F.expr("INTERVAL 10 MINUTES"),
        "event_id",
    ).select(F.col("grp").alias("event_type"), "max_concurrent", "first_peak_ts")


@register(
    "q_changepoint",
    oracle="""
    WITH daily AS (
      SELECT event_type AS grp,
             datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
             SUM(CAST(FLOOR(CAST(value AS DOUBLE) * 1000000) AS BIGINT)) AS y
      FROM events GROUP BY 1, 2),
    pts AS (
      SELECT grp, x, y,
             CAST(row_number() OVER (PARTITION BY grp ORDER BY x)
                  AS HUGEINT) AS n1,
             SUM(CAST(y AS HUGEINT)) OVER (PARTITION BY grp ORDER BY x
                 ROWS UNBOUNDED PRECEDING) AS sy1,
             SUM(CAST(y AS HUGEINT) * y) OVER (PARTITION BY grp ORDER BY x
                 ROWS UNBOUNDED PRECEDING) AS syy1
      FROM daily),
    tot AS (SELECT grp, MAX(n1) AS m, arg_max(sy1, n1) AS sy_tot,
                   arg_max(syy1, n1) AS syy_tot
            FROM pts GROUP BY 1),
    cand AS (
      SELECT p.grp, p.x AS split_x, p.n1, t.m - p.n1 AS n2, p.sy1,
             t.sy_tot - p.sy1 AS sy2,
             t.syy_tot * p.n1 * (t.m - p.n1)
               - p.sy1 * p.sy1 * (t.m - p.n1)
               - (t.sy_tot - p.sy1) * (t.sy_tot - p.sy1) * p.n1 AS num,
             p.n1 * (t.m - p.n1) AS den
      FROM pts p JOIN tot t ON p.grp = t.grp WHERE p.n1 < t.m),
    best AS (
      SELECT l.grp, l.split_x,
             SUM(CASE WHEN r.num * l.den < l.num * r.den
                        OR (r.num * l.den = l.num * r.den
                            AND r.split_x < l.split_x)
                   THEN 1 ELSE 0 END) AS n_ahead
      FROM cand l JOIN cand r ON l.grp = r.grp GROUP BY 1, 2)
    SELECT c.grp AS event_type, c.split_x,
           CAST(c.n1 AS BIGINT) AS n_left, CAST(c.n2 AS BIGINT) AS n_right,
           CAST(c.sy1 // c.n1 AS BIGINT) AS mean_left,
           CAST(c.sy2 // c.n2 AS BIGINT) AS mean_right
    FROM best b JOIN cand c ON b.grp = c.grp AND b.split_x = c.split_x
    WHERE b.n_ahead = 0
    """,
)
def q_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection per event type over the daily
    micro-unit value series (operators/trend.group_changepoint): the
    split minimizing two-segment SSE, ranked by exact decimal
    cross-multiplied rationals (count-ahead = 0, ties to the earlier
    day) — "when did this source's metric shift", the drift alarm that
    complements q_group_trend's slope. All sums are non-negative here,
    so truncating and flooring division agree on both engines."""
    from oic_options_chains_spark.operators.trend import group_changepoint

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.datediff(F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")).alias("x"),
            F.floor(F.col("value").cast("double") * 1_000_000).alias("yv"),
        )
        .groupBy("event_type", "x")
        .agg(F.sum("yv").cast("bigint").alias("y"))
    )
    out = group_changepoint(daily, "event_type", F.col("x"), F.col("y"))
    return out.select(
        F.col("grp").alias("event_type"),
        "split_x",
        "n_left",
        "n_right",
        "mean_left",
        "mean_right",
    )


@register(
    "q_gap_fill",
    oracle="""
    WITH obs AS (
      SELECT l_returnflag AS g, l_shipdate AS day,
             CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem GROUP BY 1, 2),
    bounds AS (SELECT g, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY 1),
    cal AS (SELECT g,
                   CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY))
                        AS DATE) AS day
            FROM bounds),
    filled AS (
      SELECT cal.g, cal.day,
             last_value(obs.rev IGNORE NULLS) OVER (
               PARTITION BY cal.g ORDER BY cal.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS rev_filled,
             CASE WHEN obs.rev IS NULL THEN 0 ELSE 1 END AS is_observed
      FROM cal LEFT JOIN obs ON obs.g = cal.g AND obs.day = cal.day)
    SELECT g AS l_returnflag, day,
           CAST(rev_filled AS BIGINT) AS revenue_cents,
           CAST(is_observed AS INT) AS is_observed
    FROM filled
    """,
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap-fill + forward fill of the per-flag daily revenue
    series (operators/trend.gap_fill_ffill): one gapless row per flag per
    day between its first and last shipment, carrying the last observed
    revenue across silent days — the densified axis trend/changepoint/
    drift consumers assume. Revenue goes through the DECIMAL(18,2)-cents
    path so the fill is exact integers."""
    from oic_options_chains_spark.operators.trend import gap_fill_ffill

    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("bigint")
    daily = li.select(
        "l_returnflag",
        F.col("l_shipdate").cast("date").alias("day"),
        cents.alias("revenue_cents"),
    )
    return gap_fill_ffill(daily, "l_returnflag", "day", "revenue_cents")


@register(
    "q_watermark_audit",
    oracle="""
    WITH arr AS (
      SELECT event_id, epoch_us(ts) AS us,
             epoch_us(ts) + (event_id % 16) * 20000000 AS arr_us
      FROM events),
    lat AS (
      SELECT MAX(us) OVER (ORDER BY arr_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - us AS lat_us
      FROM arr),
    t AS (SELECT * FROM (VALUES (0), (10), (60), (300), (900)) v(delay_s))
    SELECT CAST(t.delay_s AS INT) AS delay_s,
           CAST(SUM(CASE WHEN lat.lat_us > t.delay_s * 1000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
           CAST(FLOOR(10000.0 * SUM(CASE WHEN lat.lat_us > t.delay_s * 1000000
                                         THEN 1 ELSE 0 END)
                      / COUNT(*)) AS BIGINT) AS drop_bp
    FROM lat CROSS JOIN t
    GROUP BY t.delay_s
    """,
)
def q_watermark_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical watermark-drop curve
    (operators/metrics.watermark_lateness_audit): an event's lateness is
    its event-time distance below the running high-water mark in ARRIVAL
    order; a watermark of delay d drops exactly lateness > d. The
    recorded events table is perfectly ordered (event_id follows ts), so
    the query simulates transport jitter deterministically — arrival =
    ts + (event_id % 16)·20 s — and the audit must recover the resulting
    drop curve (the q_url_canonical messy-in pattern). One ordered
    window + one counter roll-up."""
    from oic_options_chains_spark.operators.metrics import (
        watermark_lateness_audit,
    )

    e = load_table(spark, sf_dir, "events")
    jittered = e.select(
        "event_id",
        "ts",
        (F.unix_micros(F.col("ts")) + (F.col("event_id") % 16) * 20_000_000)
        .alias("arr_us"),
    )
    return watermark_lateness_audit(
        jittered, "arr_us", "ts", tie_col="event_id"
    )


@register(
    "q_backfill_manifest",
    oracle="""
    WITH arr AS (
      SELECT event_id, ts, epoch_us(ts) AS us,
             epoch_us(ts) + (event_id % 16) * 20000000 AS arr_us
      FROM events),
    lat AS (
      SELECT ts,
             MAX(us) OVER (ORDER BY arr_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - us AS lat_us
      FROM arr)
    SELECT date_trunc('hour', ts) AS bucket_start,
           CAST(COUNT(*) AS BIGINT) AS n_late,
           CAST(FLOOR(MIN(lat_us) / 1000000) AS BIGINT) AS min_lateness_s,
           CAST(FLOOR(MAX(lat_us) / 1000000) AS BIGINT) AS max_lateness_s
    FROM lat WHERE lat_us > 60 * 1000000
    GROUP BY 1
    """,
)
def q_backfill_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reprocessing worklist a 60 s watermark creates
    (operators/metrics.backfill_manifest): the would-be-dropped events
    of q_watermark_audit's jittered stream, grouped by their event-time
    HOUR — the exact partitions a batch backfill recomputes to reconcile
    the streaming tables. Same ordered pass as the audit plus one
    bucket-keyed aggregate."""
    from oic_options_chains_spark.operators.metrics import backfill_manifest

    e = load_table(spark, sf_dir, "events")
    jittered = e.select(
        "event_id",
        "ts",
        (F.unix_micros(F.col("ts")) + (F.col("event_id") % 16) * 20_000_000)
        .alias("arr_us"),
    )
    return backfill_manifest(
        jittered, "arr_us", "ts", watermark_s=60, tie_col="event_id"
    )


@register(
    "q_episode_build",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL 30 MINUTE THEN 1 ELSE 0
             END AS new_session
      FROM ordered),
    numbered AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(new_session) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS INT)
               AS session_idx
      FROM flagged),
    ep AS (
      SELECT user_id || ':' || session_idx AS episode_key,
             string_agg(event_type, ' ' ORDER BY ts, event_id) AS text,
             CAST(COUNT(*) AS BIGINT) AS n_tokens
      FROM numbered GROUP BY user_id, session_idx),
    sh AS (
      SELECT episode_key, text, n_tokens,
             CAST(concat('0x', substr(md5(episode_key), 1, 4)) AS INT) % 8
               AS shard,
             md5(episode_key) AS hh
      FROM ep),
    c AS (
      SELECT episode_key, text, n_tokens, shard,
             CAST(SUM(n_tokens) OVER (
               PARTITION BY shard ORDER BY hh, episode_key
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS BIGINT) AS stream_start
      FROM sh)
    SELECT episode_key, text, n_tokens, CAST(shard AS INT) AS shard,
           stream_start,
           CAST(stream_start // 64 AS BIGINT) AS seq_index,
           CAST(stream_start % 64 AS BIGINT) AS seq_offset
    FROM c
    """,
)
def q_episode_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-corpus flagship: sessionize the event stream (30-min
    gap), linearize each session into an event-type token sequence in
    (ts, event_id) order, and pack the episodes into 64-token training
    sequences — the log-to-LM pipeline (sessionization -> serialization
    -> packing) in one plan. The user-keyed exchange serves the lag
    window, the session numbering, AND the episode rollup; packing adds
    its one shard-keyed exchange."""
    from oic_options_chains_spark.operators.chunking import pack_stream_offsets

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    numbered = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(
            F.when(
                F.lag("ts").over(w).isNull()
                | (gap_us > 30 * 60 * 1_000_000),
                1,
            ).otherwise(0)
        )
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("int")
        .alias("session_idx"),
    )
    episodes = numbered.groupBy("user_id", "session_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("ts", "event_id", F.col("event_type").alias("et"))
                    )
                ),
                lambda x: x["et"],
            ),
            " ",
        ).alias("text"),
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
    ).select(
        F.concat_ws(":", F.col("user_id"), F.col("session_idx")).alias(
            "episode_key"
        ),
        "text",
        "n_tokens",
    )
    packed = pack_stream_offsets(
        episodes.select("episode_key", "n_tokens"),
        key="episode_key",
        context=64,
        n_shards=8,
    )
    return packed.join(episodes.select("episode_key", "text"), "episode_key").select(
        "episode_key",
        "text",
        F.col("n_tokens"),
        "shard",
        "stream_start",
        "seq_index",
        "seq_offset",
    )
