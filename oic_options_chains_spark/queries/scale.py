"""Scale-path t2 queries: the operations whose whole point is surviving
100 TB — per-group sketch estimates, mergeable histogram quantiles,
exact prefix-filter similarity join, weight-proportional systematic
sampling, and the salted skew join.

Every decision in every query is integer (md5-derived buckets, integer
division, cross-multiplied comparisons), so the DuckDB oracles are
bit-identical by construction — the same discipline the sketch family
established after the round-3 cross-engine divergences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.sampling import systematic_weighted_sample
from oic_options_chains_spark.operators.setsim import prefix_join_sets
from oic_options_chains_spark.operators.sketches import (
    binned_histogram,
    histogram_quantiles,
    hll_group_estimate,
    hll_group_registers,
    hll_linear_table,
    hll_numerator,
    merge_histograms,
)
from oic_options_chains_spark.operators.skew import salted_join
from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table

_HLL_NUM_256 = hll_numerator(256)
_HLL_TABLE_256 = ", ".join(str(x) for x in hll_linear_table(256))


@register(
    "q_hll_groupby",
    oracle=f"""
    WITH h AS (SELECT event_type AS grp, md5(CAST(user_id AS VARCHAR)) AS h
               FROM events GROUP BY 1, 2),
    r AS (SELECT grp, CAST(concat('0x', substring(h, 1, 2)) AS INT) AS reg,
                 CAST(concat('0x', substring(h, 3, 13)) AS BIGINT) AS v
          FROM h),
    m AS (SELECT grp, reg, MAX(IF(v = 0, 53, 53 - length(bin(v)))) AS rho
          FROM r GROUP BY grp, reg),
    s AS (SELECT grp, COUNT(*) AS n_regs,
                 SUM((CAST(1 AS BIGINT) << (53 - rho))) AS t
          FROM m GROUP BY grp),
    e AS (SELECT grp, CAST(256 - n_regs AS BIGINT) AS n_zero_regs,
                 CAST(CAST('{_HLL_NUM_256}' AS HUGEINT)
                      // CAST(t + (CAST(1 AS BIGINT) << 53) * (256 - n_regs)
                              AS HUGEINT) AS BIGINT) AS raw_est
          FROM s)
    SELECT grp AS event_type, n_zero_regs,
           CAST(IF(raw_est <= 640 AND n_zero_regs > 0,
                   ([{_HLL_TABLE_256}])[CAST(n_zero_regs AS INT)],
                   raw_est) AS BIGINT) AS estimate
    FROM e
    """,
)
def q_hll_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate COUNT(DISTINCT user) GROUP BY event_type — the
    per-group form of the deterministic HLL (b=8). The register build is
    the only data-sized stage (one hash aggregate, map-side combined to
    <= groups * 256 rows per partition); the estimate reads the bounded
    register relation. ``approx_count_distinct`` answers this with an
    engine-private sketch; this one is portable and mergeable
    (``hll_merge_registers`` per group combines shard sketches)."""
    e = load_table(spark, sf_dir, "events")
    regs = hll_group_registers(e, "user_id", "event_type", b=8)
    est = hll_group_estimate(regs, b=8)
    return est.select(
        F.col("grp").alias("event_type"), "n_zero_regs", "estimate"
    )


@register(
    "q_quantile_sketch",
    oracle="""
    WITH hist AS (SELECT n_chars // 64 AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
                  FROM documents GROUP BY 1),
    cum AS (SELECT bin, cnt,
                   SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(cnt) OVER () AS total
            FROM hist),
    hit AS (SELECT p, bin, cum, total,
                   row_number() OVER (PARTITION BY p ORDER BY bin) AS rn
            FROM cum JOIN (VALUES (50), (90), (99)) AS t(p)
              ON 100 * cum >= p * total)
    SELECT CAST(p AS INT) AS p,
           CAST(bin * 64 AS BIGINT) AS bin_lo,
           CAST((bin + 1) * 64 AS BIGINT) AS bin_hi,
           CAST(cum AS BIGINT) AS cum, CAST(total AS BIGINT) AS total
    FROM hit WHERE rn = 1
    """,
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of document length from a MERGED fixed-width-bin
    histogram — the mergeable quantile sketch: each source shard
    histograms its own data (one partial-aggregated groupBy), the
    bin relations sum together, and the quantile is read off the
    cumulative bins with error bounded by the bin width. No global sort
    of the data anywhere; the oracle builds the histogram directly,
    which the exact merge makes the same relation."""
    d = load_table(spark, sf_dir, "documents")
    shards = binned_histogram(d, "n_chars", 64, group_col="source")
    merged = merge_histograms(shards)
    return histogram_quantiles(merged, 64, percentiles=(50, 90, 99))


@register(
    "q_prefix_join",
    # The oracle computes the exact qualifying-pair set the
    # algorithm-independent way (full inverted-index join + integer
    # Jaccard test) — the prefix/length/positional filters on the Spark
    # side are pruning only and cannot change the result.
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
    idx AS (SELECT doc_id, t,
                   unnest(range(0, greatest(len(t) - 2, 0))) AS i
            FROM toks),
    sh AS (SELECT DISTINCT doc_id,
                  t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS term
           FROM idx),
    sized AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
              FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(COUNT(*) AS BIGINT) AS inter_n
      FROM sh a JOIN sh b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, inter_n,
           sa.n + sb.n - inter_n AS union_n,
           CAST(1000000 * inter_n AS BIGINT) // (sa.n + sb.n - inter_n)
             AS jaccard_e6
    FROM inter
    JOIN sized sa ON sa.doc_id = doc_a
    JOIN sized sb ON sb.doc_id = doc_b
    WHERE 100 * inter_n >= 50 * (sa.n + sb.n - inter_n)
    """,
)
def q_prefix_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT all-pairs with 3-gram SHINGLE-set Jaccard >= 0.5 via prefix
    filtering (AllPairs/PPJoin) — the deterministic complement to the
    probabilistic MinHash-LSH pairs, over the same shingle
    representation. Candidates come from an inverted index over each
    document's rarest ``n - ceil(t*n) + 1`` shingles (complete by the
    prefix property) pruned by the integer length and positional
    filters; verification cross-multiplies the Jaccard test in
    integers over per-document sorted shingle arrays.

    Shingles, not unigram tokens, by design: over a small token
    vocabulary most documents are near-identical as unigram SETS and
    the qualifying-pair set itself goes quadratic (measured 8.9M pairs
    at sf0.1); the combinatorial shingle space keeps both the prefix
    index and the true answer sparse at any corpus size."""
    from oic_options_chains_spark.operators.minhash import doc_shingles

    # hash-spread the doc relation before the CPU-dense shingle
    # explode: the compact single-file scan yields 1-3 splits locally,
    # so without an explicit exchange the tokenize+shingle work runs on
    # as many cores (same rationale as similarity._probe_partitions;
    # partitioning cannot change any downstream integer decision)
    from oic_options_chains_spark.operators.similarity import _probe_partitions

    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(_probe_partitions(d), F.col("doc_id"))
    sets = doc_shingles(d, "doc_id", "text").select(
        "doc_id", F.col("shingle").alias("term")
    )
    return prefix_join_sets(sets, t_pct=50)


@register(
    "q_systematic_sample",
    oracle="""
    WITH c AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
      FROM documents)
    SELECT doc_id, source, n_chars, CAST(cum AS BIGINT) AS cum_weight
    FROM c WHERE (cum - n_chars) // 50000 < cum // 50000
    """,
)
def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-proportional systematic sample of the corpus (one document
    per ~50k characters of running total, long docs always kept) — the
    "sample N tokens, not N documents" selection. Spark runs the
    cumulative sum two-phase over md5-leading-byte buckets (no global
    window); the oracle's single global window is the same total order,
    so membership matches row-for-row."""
    d = load_table(spark, sf_dir, "documents")
    s = systematic_weighted_sample(d, "doc_id", "n_chars", step=50_000)
    return s.select("doc_id", "source", "n_chars", "cum_weight")


@register(
    "q_priority_sample",
    oracle="""
    WITH p AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
             (CAST(n_chars AS BIGINT) * 1125899906842624)
               // (CAST(concat('0x',
                        substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
                        AS BIGINT) + 1) AS priority
      FROM documents),
    r AS (SELECT * FROM p ORDER BY priority DESC, doc_id ASC LIMIT 51),
    t AS (SELECT MIN(priority) AS tau FROM r),
    s AS (SELECT * FROM p ORDER BY priority DESC, doc_id ASC LIMIT 50)
    SELECT s.doc_id, s.w, s.priority, t.tau,
           CAST(GREATEST(s.w * 1125899906842624, t.tau) AS BIGINT)
             AS w_est_sc
    FROM s, t
    """,
)
def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): exactly 50 documents,
    length-biased, with the (k+1)-th priority as threshold and exact
    scaled Horvitz-Thompson weight estimates — the fixed-SIZE
    counterpart of q_systematic_sample's fixed-step scheme (a token
    budget picks the step; a document budget picks k). Priorities are
    content-hash integers (w * 2^50 div u), so membership is a pure
    function of corpus content — no RNG, identical on every engine.
    Plans as TakeOrderedAndProject: per-partition top-51, no global
    sort."""
    from oic_options_chains_spark.operators.sampling import priority_sample

    d = load_table(spark, sf_dir, "documents")
    return priority_sample(d, "doc_id", "n_chars", k=50)


@register(
    "q_salted_join",
    oracle="""
    SELECT p.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2)))
                     AS DECIMAL(28,2)) AS VARCHAR) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY 1
    """,
)
def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-split fact-dim join: lineitem's hot part keys are spread
    across 8 salted reducers and the dim side is replicated to meet
    them (``skew.salted_join``), then aggregated per brand. The oracle
    is the UNSALTED join — salting must never change answers, only the
    reducer-key cardinality; this attests the join pattern the way
    ``q_salted_agg`` attests the aggregation pattern."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"),
        F.col("l_orderkey"),
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    joined = salted_join(li, p, on=["p_partkey"], left_salt_from="l_orderkey")
    return joined.groupBy(F.col("p_brand").alias("brand")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("qty").cast("decimal(28,2)").cast("string").alias("total_qty"),
    )


@register(
    "q_bloom_join",
    # the bucket pre-filter is pruning-only (false positives removed by
    # the exact join, true matches never dropped), so the oracle is the
    # PLAIN join — algorithm-independent, like q_skyline's
    oracle="""
    SELECT c.c_nationkey AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(FLOOR(CAST(o.o_totalprice AS DOUBLE) * 100)
                         AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY 1
    """,
)
def q_bloom_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders of BUILDING-segment customers by nation, joined through
    the explicit runtime bucket filter (operators/rtfilter.py): the dim
    side collapses to its distinct hash-mod-m key buckets (≤ m rows no
    matter how big the dim is), the fact side is broadcast-semi-pruned
    on those buckets BEFORE the join shuffle, then the exact equi-join
    runs on the survivors — Spark's runtime Bloom filter as an
    always-on relational operator."""
    from oic_options_chains_spark.operators.rtfilter import runtime_filter_join

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    joined = runtime_filter_join(orders, cust, "o_custkey", "c_custkey")
    return joined.groupBy(F.col("c_nationkey").alias("nation")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice").cast("double") * 100).cast("bigint")
        )
        .cast("bigint")
        .alias("total_cents"),
    )


@register(
    "q_rolling_distinct",
    oracle=f"""
    WITH h AS (SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day,
                      md5(CAST(user_id AS VARCHAR)) AS h
               FROM events GROUP BY 1, 2),
    r AS (SELECT day, CAST(concat('0x', substring(h, 1, 2)) AS INT) AS reg,
                 CAST(concat('0x', substring(h, 3, 13)) AS BIGINT) AS v
          FROM h),
    dayreg AS (SELECT day, reg, MAX(IF(v = 0, 53, 53 - length(bin(v)))) AS rho
               FROM r GROUP BY day, reg),
    days AS (SELECT DISTINCT day FROM dayreg),
    win AS (SELECT d.day, dr.reg, MAX(dr.rho) AS rho
            FROM days d JOIN dayreg dr ON dr.day BETWEEN d.day - 6 AND d.day
            GROUP BY 1, 2),
    s AS (SELECT day, COUNT(*) AS n_regs,
                 SUM((CAST(1 AS BIGINT) << (53 - rho))) AS t
          FROM win GROUP BY day),
    e AS (SELECT day, CAST(256 - n_regs AS BIGINT) AS n_zero_regs,
                 CAST(CAST('{_HLL_NUM_256}' AS HUGEINT)
                      // CAST(t + (CAST(1 AS BIGINT) << 53) * (256 - n_regs)
                              AS HUGEINT) AS BIGINT) AS raw_est
          FROM s)
    SELECT CAST(day AS INT) AS day, n_zero_regs,
           CAST(IF(raw_est <= 640 AND n_zero_regs > 0,
                   ([{_HLL_TABLE_256}])[CAST(n_zero_regs AS INT)],
                   raw_est) AS BIGINT) AS estimate
    FROM e
    """,
)
def q_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct-user estimate per active day — the
    sketch-mergeability showcase: daily HLL register sets are built ONCE
    from the data (the only data-sized stage), and every 7-day window is
    answered by MAX-merging seven bounded register relations — at 100 TB
    the raw events are scanned once per day ever, and any window, month,
    or lifetime rollup reads days x 256 register rows instead. The
    day-range join keys the bounded calendar relation against the
    register table; the estimate is the shared integer-literal HLL path
    (no float anywhere)."""
    e = load_table(spark, sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
    ).alias("day")
    regs = hll_group_registers(
        e.select(day, "user_id"), "user_id", "day", b=8
    )
    days = regs.select(F.col("grp").alias("day")).distinct()
    win = (
        F.broadcast(days)
        .join(
            regs,
            (regs["grp"] >= days["day"] - 6) & (regs["grp"] <= days["day"]),
        )
        .groupBy("day", "reg")
        .agg(F.max("rho").alias("rho"))
    )
    est = hll_group_estimate(
        win.select(F.col("day").alias("grp"), "reg", "rho"), b=8
    )
    return est.select(
        F.col("grp").cast("int").alias("day"), "n_zero_regs", "estimate"
    )
