"""Distinct-count sketching: KMV (k minimum values) and a deterministic
HyperLogLog.

``approx_count_distinct`` (HLL) is the built-in, but its estimate is
implementation-defined — unusable where two engines (or two runs of a
changing implementation) must agree. KMV is the deterministic
alternative: hash every distinct value to a uniform fraction, keep the k
smallest; the k-th smallest fraction m estimates the distinct count as
(k-1)/m. Everything is md5-derived, so ANY engine computes the
bit-identical sketch and estimate. ``hll_distinct_estimate`` is the
register-based sketch in the same portable style: md5 buckets + integer
rank-of-first-set-bit registers, with every floating step either exact
(power-of-two scaling) or a shared literal (the log-based small-range
table is precomputed once and embedded in both engines' plans).

Determinism details that matter cross-engine:
- The fraction is the first 13 md5 hex chars (52 bits) over 2^52 — the
  numerator fits a double's mantissa exactly and the denominator is a
  power of two, so the division is EXACT in IEEE754, not approximately
  equal across engines.
- Every ESTIMATE is a pure integer division: the KMV saturation
  estimate recovers the 52-bit numerator from the fraction (exact
  power-of-two multiply) and divides integers; the HLL raw estimate
  divides a precomputed integer-literal numerator by the scaled-integer
  harmonic sum. No double division decides any output value.

Scale notes: the k-minima come from a global sort-limit, which Spark
plans as TakeOrderedAndProject — per-partition top-k then a k-sized
merge on one reducer; no full sort, no full shuffle. Sketches are
mergeable (union the minima lists, re-take k smallest), which is what
makes them partition-parallel at 100 TB: sketch per partition/day, merge
for any rollup window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TWO_POW_52 = float(2**52)


def hash_fraction(col: Column) -> Column:
    """Uniform [0,1) fraction from md5 of the value's string form; exact
    in double precision on every engine."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 13), 16, 10).cast("double")
        / F.lit(TWO_POW_52)
    )


def kmv_minima(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """The sketch itself: the k smallest hash fractions of the distinct
    values (fewer rows iff the true distinct count is below k). Two
    sketches merge by union + re-limit — associative and deterministic."""
    return (
        df.select(F.col(col))
        .distinct()
        .select(hash_fraction(F.col(col)).alias("f"))
        .orderBy("f")
        .limit(k)
    )


def kmv_distinct_estimate(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """One row: (n_minima, estimate). Below saturation the sketch has
    seen every distinct value and the estimate IS the exact count; at
    saturation the k-th minimum m gives floor((k-1)/m)."""
    return kmv_estimate_from_minima(kmv_minima(df, col, k), k)


def kmv_estimate_from_minima(minima: DataFrame, k: int = 64) -> DataFrame:
    """Estimate from an explicit minima relation (single column ``f``) —
    the mergeable seam: per-shard minima union and re-limit
    (``kmv_merge_minima``) into exactly the global sketch, because the k
    smallest of a union are always among each side's k smallest.

    The saturation estimate floor((k-1)/m) runs as a PURE INTEGER
    division: m is v/2^52 with v the 52-bit md5 prefix, so v is
    recovered exactly (power-of-two multiply) and the estimate is
    (k-1)*2^52 DIV v — no double division anywhere in the decision
    path, so the engines cannot disagree by an ulp."""
    agg = minima.agg(
        F.count(F.lit(1)).alias("n_minima"), F.max("f").alias("__m")
    )
    num = (k - 1) << 52
    return agg.select(
        F.col("n_minima").cast("bigint").alias("n_minima"),
        F.when(F.col("n_minima") < k, F.col("n_minima"))
        .otherwise(
            F.expr(
                f"CAST({num} AS BIGINT) div CAST(__m * CAST({2**52} AS DOUBLE) AS BIGINT)"
            )
        )
        .cast("bigint")
        .alias("estimate"),
    )


def kmv_group_minima(
    df: DataFrame, col: str, group_col: str, k: int = 64
) -> DataFrame:
    """(grp, f): each group's k smallest hash fractions — the shard-local
    KMV sketches. Plans as one WindowGroupLimit per group (running top-k
    inside each hash partition), so a group with billions of distinct
    values never materializes."""
    from pyspark.sql import Window

    dv = df.select(F.col(group_col).alias("grp"), F.col(col)).distinct()
    f = dv.select("grp", hash_fraction(F.col(col)).alias("f"))
    w = Window.partitionBy("grp").orderBy(F.col("f").asc())
    return (
        f.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select("grp", "f")
    )


def kmv_merge_minima(shard_minima: DataFrame, k: int = 64) -> DataFrame:
    """Union-merge shard minima: distinct, then re-take the k smallest —
    EXACT with respect to the union of the underlying sets (the k
    smallest overall are among every shard's k smallest). The distinct
    matters: a value living in several shards contributes its fraction
    once per shard, and double-counting a minimum would shrink the
    estimate. Input is <= shards * k rows, so both the distinct and the
    TakeOrderedAndProject are sketch-sized."""
    return shard_minima.select("f").distinct().orderBy("f").limit(k)


def hll_linear_table(m: int) -> list[int]:
    """Small-range correction lookup: floor(m * ln(m / V)) for V zero
    registers, V = 1..m. Computed ONCE here with the driver's libm and
    embedded as integer literals in both the Spark plan and the DuckDB
    oracle — the log itself never runs inside either engine, so last-ulp
    libm differences cannot desynchronize hashed outputs."""
    import math

    return [int(math.floor(m * math.log(m / v))) for v in range(1, m + 1)]


def hll_numerator(m: int) -> int:
    """floor(alpha_m * m^2 * 2^53): the raw-estimate numerator as ONE
    exact integer, computed here in Python and embedded as a literal in
    both engines' plans. The raw estimate is then a pure integer
    division ``numerator DIV sum_scaled`` (decimal(38,0) on Spark,
    HUGEINT on DuckDB) — no double exists anywhere in the estimate path,
    so the engines cannot disagree by an ulp."""
    import math

    b = m.bit_length() - 1
    alpha = 0.7213 / (1 + 1.079 / m) if b >= 7 else (0.697 if b == 6 else 0.673)
    return int(math.floor(alpha * (m * m) * 9007199254740992))


def hll_registers(df: DataFrame, col: str, b: int = 8) -> DataFrame:
    """(reg, rho) HyperLogLog registers, md5-derived and engine-portable.

    Register index: the first b/4 md5 hex chars (b bits). Rank: position
    of the first set bit in the next 52 bits (13 hex chars), computed as
    integer/string ops only — ``53 - length(bin(v))``, with v = 0 mapping
    to rho = 53. One groupBy over distinct hashes; map-side combine makes
    the shuffle at most m * partitions rows at any corpus size.

    Registers never observed are ABSENT (the estimator treats them as
    rho = 0); b must be a multiple of 4 so the bucket is a whole hex
    prefix."""
    assert b % 4 == 0 and 4 <= b <= 16, "b must be 4, 8, 12, or 16"
    hx = b // 4
    h = df.select(F.md5(F.col(col).cast("string")).alias("__h")).distinct()
    r = h.selectExpr(
        f"CAST(conv(substring(__h, 1, {hx}), 16, 10) AS INT) AS reg",
        f"CAST(conv(substring(__h, {hx + 1}, 13), 16, 10) AS BIGINT) AS __v",
    )
    return r.groupBy("reg").agg(
        F.expr("MAX(IF(__v = 0, 53, 53 - length(bin(__v)))) AS rho")
    )


def hll_distinct_estimate(df: DataFrame, col: str, b: int = 8) -> DataFrame:
    """One row: (m, n_zero_regs, sum_scaled, raw_est, estimate).

    The harmonic mean runs in scaled integers — sum of 2^(53 - rho) with
    absent registers contributing 2^53 — so the cross-partition summation
    order cannot perturb a float. The raw estimate is a pure integer
    division of the precomputed ``hll_numerator`` literal by sum_scaled
    (no double anywhere in the path); the small-range branch (raw
    estimate <= 2.5m with empty registers present, the standard HLL
    correction) reads the precomputed ``hll_linear_table`` instead of
    evaluating a log in-engine. Standard error ~1.04/sqrt(2^b)."""
    return hll_estimate_from_registers(hll_registers(df, col, b), b)


def hll_estimate_from_registers(regs: DataFrame, b: int = 8) -> DataFrame:
    """Estimate from an explicit (reg, rho) register relation — the seam
    that makes the sketch MERGEABLE: registers built per shard/source
    (``hll_group_registers``) union-merge with a MAX per register, and
    this estimator is oblivious to where they came from. Same integer
    harmonic-sum math as ``hll_distinct_estimate``."""
    m = 1 << b
    table = ", ".join(str(x) for x in hll_linear_table(m))
    num = hll_numerator(m)
    s = regs.agg(
        F.expr("COUNT(*) AS __n_regs"),
        # COALESCE so an EMPTY input yields sum_scaled = m * 2^53 and a
        # raw estimate that the all-zero-registers branch maps to ~0
        F.expr(
            "COALESCE(SUM(shiftleft(CAST(1 AS BIGINT), 53 - rho)), CAST(0 AS BIGINT)) AS __t_seen"
        ),
    )
    return s.selectExpr(
        f"CAST({m} AS BIGINT) AS m",
        f"CAST({m} - __n_regs AS BIGINT) AS n_zero_regs",
        f"__t_seen + shiftleft(CAST(1 AS BIGINT), 53) * ({m} - __n_regs) AS sum_scaled",
        f"CAST({num} AS DECIMAL(38,0)) DIV CAST(__t_seen + shiftleft(CAST(1 AS BIGINT), 53) * ({m} - __n_regs) AS DECIMAL(38,0)) AS raw_est",
    ).selectExpr(
        "m",
        "n_zero_regs",
        "sum_scaled",
        "raw_est",
        f"CAST(IF(raw_est <= {(5 * m) // 2} AND n_zero_regs > 0, "
        f"element_at(array({table}), CAST(n_zero_regs AS INT)), raw_est) AS BIGINT) AS estimate",
    )


def hll_group_registers(
    df: DataFrame, col: str, group_col: str, b: int = 8
) -> DataFrame:
    """(grp, reg, rho): one HLL register set PER GROUP — the shard-local
    sketches of a sharded/per-source pipeline. Merging groups is
    MAX(rho) per register (set union is exact under the sketch), so a
    100 TB corpus can sketch each source/day/shard independently and
    combine the bounded register relations afterwards — no re-scan of
    the raw data to get the union's distinct count.

    Same md5 register/rank derivation as ``hll_registers``; the shuffle
    carries at most groups * m rows after map-side combine."""
    assert b % 4 == 0 and 4 <= b <= 16, "b must be 4, 8, 12, or 16"
    hx = b // 4
    h = df.select(
        F.col(group_col).alias("grp"),
        F.md5(F.col(col).cast("string")).alias("__h"),
    ).distinct()
    r = h.selectExpr(
        "grp",
        f"CAST(conv(substring(__h, 1, {hx}), 16, 10) AS INT) AS reg",
        f"CAST(conv(substring(__h, {hx + 1}, 13), 16, 10) AS BIGINT) AS __v",
    )
    return r.groupBy("grp", "reg").agg(
        F.expr("MAX(IF(__v = 0, 53, 53 - length(bin(__v)))) AS rho")
    )


def hll_merge_registers(shard_regs: DataFrame) -> DataFrame:
    """Union-merge shard register sets into one (reg, rho) relation:
    MAX per register. Associative and commutative, so any merge tree —
    per-executor partials, per-day rollups, cross-cluster combination —
    yields the identical global sketch."""
    return shard_regs.groupBy("reg").agg(F.max("rho").alias("rho"))



# --------------------------------------------------------------------------
# Bloom-filter manifests (equality-predicate file skipping)
# --------------------------------------------------------------------------

BLOOM_WORD_BITS = 32  # words hold 32 used bits: shiftleft never reaches
# bit 63, where signed-overflow semantics diverge across engines (DuckDB
# raises on 1<<63, Spark wraps)


def _bloom_positions(key: Column, k: int, m_bits: int) -> list[Column]:
    """k hash positions in [0, m_bits): disjoint 8-hex-char (32-bit)
    md5 chunks of the key's string form, mod m_bits — the md5-derived
    portable-hash idiom every sketch here shares."""
    h = F.md5(key.cast("string"))
    return [
        F.conv(F.substring(h, 8 * j + 1, 8), 16, 10).cast("bigint") % m_bits
        for j in range(k)
    ]


def bloom_words(
    df: DataFrame,
    key: Column,
    bucket: Column,
    m_bits: int = 1024,
    k: int = 3,
) -> DataFrame:
    """Per-bucket Bloom filter as (bucket, word_idx, word) rows — the
    equality-predicate companion of the min/max manifest
    (operators/layout.partition_stats): min/max skips range predicates,
    the Bloom manifest skips ``key = ?`` probes on high-cardinality
    columns where ranges are useless.

    Relational build: k positions per row -> one map-side-combined
    bit_or onto (bucket, word_idx) keys, so the exchange carries at most
    buckets * m_bits/32 rows regardless of data size. Long form instead
    of a packed array so two manifests merge by the same bit_or
    aggregate (associative, order-independent, engine-exact integers).
    """
    pos = F.explode(F.array(*_bloom_positions(key, k, m_bits))).alias("__p")
    bits = df.select(bucket.alias("bucket"), pos).select(
        "bucket",
        (F.col("__p") / BLOOM_WORD_BITS).cast("bigint").alias("word_idx"),
        # shiftleft needs a column bit count -> SQL form (the Column API
        # only takes a literal)
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__p % {BLOOM_WORD_BITS} AS INT))").alias("__m"),
    )
    return bits.groupBy("bucket", "word_idx").agg(F.bit_or("__m").alias("word"))


def bloom_probe(
    manifest: DataFrame,
    probes: DataFrame,
    probe_col: str,
    m_bits: int = 1024,
    k: int = 3,
) -> DataFrame:
    """(probe value, n_buckets_maybe): how many buckets a ``key = probe``
    scan must still read after Bloom skipping. A bucket survives iff ALL
    k probe bits are set, i.e. it contributes k matching (word_idx,
    bit-set) rows — counted with one broadcast join of the (tiny) probe
    bit list against the manifest. No per-bucket loop, no UDF."""
    pb = probes.select(
        F.col(probe_col),
        F.posexplode(
            F.array(*_bloom_positions(F.col(probe_col), k, m_bits))
        ).alias("__j", "__p"),
    ).select(
        probe_col,
        "__j",
        (F.col("__p") / BLOOM_WORD_BITS).cast("bigint").alias("word_idx"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(__p % {BLOOM_WORD_BITS} AS INT))").alias("__m"),
    )
    hits = (
        manifest.join(F.broadcast(pb), "word_idx")
        .filter(F.col("word").bitwiseAND(F.col("__m")) == F.col("__m"))
        .select(probe_col, "bucket", "__j")
        .distinct()
        .groupBy(probe_col, "bucket")
        .agg(F.count(F.lit(1)).alias("__nbits"))
        .filter(F.col("__nbits") == k)
    )
    return hits.groupBy(probe_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_maybe")
    )


# --------------------------------------------------------------------------
# Count-min sketch (frequency estimation / heavy hitters)
# --------------------------------------------------------------------------


def cms_counters(
    df: DataFrame,
    key: Column,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch as (row_idx, pos, cnt) counter rows: row i
    counts occurrences at position md5-chunk_i(key) % width.

    depth*width bounded counter keys with map-side partial sums — the
    sketch build shuffles a dictionary, not the data. Counters are plain
    integer sums, so sketches merge by adding counters (the distributed
    aggregation property CMS exists for) and match any engine exactly."""
    rows = df.select(
        F.posexplode(
            F.array(*_bloom_positions(key, depth, width))
        ).alias("row_idx", "pos")
    )
    return rows.groupBy("row_idx", "pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    probe_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(probe value, est): min over the sketch rows of the probed
    counter — the CMS point estimate (an upper bound on the true count;
    collisions only inflate). Probe side is rows*depth tiny and
    broadcast."""
    pb = probes.select(
        F.col(probe_col),
        F.posexplode(
            F.array(*_bloom_positions(F.col(probe_col), depth, width))
        ).alias("row_idx", "pos"),
    )
    return (
        sketch.join(F.broadcast(pb), ["row_idx", "pos"])
        .groupBy(probe_col)
        .agg(F.min("cnt").cast("bigint").alias("est"))
    )


def cms_group_counters(
    df: DataFrame,
    key: Column,
    group_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(grp, row_idx, pos, cnt): one count-min sketch PER GROUP — the
    shard-local counter matrices. Same md5-chunk positions as
    ``cms_counters``; the shuffle carries at most groups * depth * width
    counter rows after map-side combine."""
    rows = df.select(
        F.col(group_col).alias("grp"),
        F.posexplode(
            F.array(*_bloom_positions(key, depth, width))
        ).alias("row_idx", "pos"),
    )
    return rows.groupBy("grp", "row_idx", "pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def cms_merge_counters(shard_sketches: DataFrame) -> DataFrame:
    """Merge shard sketches by cell-wise SUM — exact (counters are plain
    sums, so the merged matrix IS the matrix a direct build produces),
    associative, and bounded: input and output are counter dictionaries,
    never data."""
    return shard_sketches.groupBy("row_idx", "pos").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def bloom_merge_words(manifest: DataFrame) -> DataFrame:
    """Collapse a per-bucket Bloom manifest into ONE filter over the
    union of all buckets' keys: bit_or per word — exact (a bit is set in
    the union's filter iff some key set it in some bucket's), associative
    and order-independent like every merge in this module. The result is
    the table-level filter a cross-partition ``key = ?`` probe consults
    before touching any bucket manifest, and the same aggregate merges
    two tables' manifests (e.g. combining daily filters into a monthly
    one)."""
    return manifest.groupBy("word_idx").agg(F.bit_or("word").alias("word"))


def hll_group_estimate(group_regs: DataFrame, b: int = 8) -> DataFrame:
    """(grp, estimate): the per-group distinct-count estimate from a
    ``hll_group_registers`` relation — approximate COUNT(DISTINCT x)
    GROUP BY y, the query ``approx_count_distinct`` answers with an
    engine-private sketch and this answers engine-portably.

    Same integer-only math as ``hll_estimate_from_registers``, run once
    per group in a single hash aggregate: scaled harmonic sum (absent
    registers contribute 2^53 via the m - n_regs term), precomputed
    integer-literal numerator, integer division, table-lookup
    small-range branch. The aggregate's input is at most groups * m
    rows (the register relation), so at 100 TB the estimate step costs
    the same as at 100 MB — only the register build ever sees data."""
    m = 1 << b
    table = ", ".join(str(x) for x in hll_linear_table(m))
    num = hll_numerator(m)
    s = group_regs.groupBy("grp").agg(
        F.expr("COUNT(*) AS __n_regs"),
        F.expr(
            "SUM(shiftleft(CAST(1 AS BIGINT), 53 - rho)) AS __t_seen"
        ),
    )
    return s.selectExpr(
        "grp",
        f"CAST({m} - __n_regs AS BIGINT) AS n_zero_regs",
        f"CAST({num} AS DECIMAL(38,0)) DIV CAST(__t_seen + shiftleft(CAST(1 AS BIGINT), 53) * ({m} - __n_regs) AS DECIMAL(38,0)) AS raw_est",
    ).selectExpr(
        "grp",
        "n_zero_regs",
        f"CAST(IF(raw_est <= {(5 * m) // 2} AND n_zero_regs > 0, "
        f"element_at(array({table}), CAST(n_zero_regs AS INT)), raw_est) AS BIGINT) AS estimate",
    )


def hll_intersect_estimate(
    left: DataFrame,
    left_col: str,
    right: DataFrame,
    right_col: str,
    b: int = 8,
) -> DataFrame:
    """One row (est_left, est_right, est_union, est_intersect): the
    distinct-count overlap of two key sets by HLL inclusion-exclusion —
    |A∩B| ≈ |A| + |B| − |A∪B|, the join-cardinality probe a planner (or
    a data-debugger asking "how much of the fact table has a matching
    dim row") runs WITHOUT joining anything.

    The union sketch is ``hll_merge_registers`` of the two sides' exact
    register relations — the HLL property that makes the subtraction
    meaningful (the union estimate comes from the same sketch family,
    not a rescan). All three estimates are the integer-division
    estimator of ``hll_estimate_from_registers``, so the output is
    engine-exact; the intersection difference can go negative within
    sketch error on near-disjoint sets and is reported as-is (clamp at
    the caller if a cardinality is needed).

    Scale: each side's register build is its only data-sized stage
    (map-side-combined to <= m rows per partition); the merge and the
    three estimates run over <= 3m register rows total."""
    lr = hll_registers(left, left_col, b)
    rr = hll_registers(right, right_col, b)
    ur = hll_merge_registers(lr.unionByName(rr))
    le = hll_estimate_from_registers(lr, b).select(
        F.col("estimate").alias("est_left")
    )
    re_ = hll_estimate_from_registers(rr, b).select(
        F.col("estimate").alias("est_right")
    )
    ue = hll_estimate_from_registers(ur, b).select(
        F.col("estimate").alias("est_union")
    )
    one = le.crossJoin(re_).crossJoin(ue)
    return one.select(
        "est_left",
        "est_right",
        "est_union",
        (F.col("est_left") + F.col("est_right") - F.col("est_union"))
        .cast("bigint")
        .alias("est_intersect"),
    )


def binned_histogram(
    df: DataFrame, col: str, bin_width: int, group_col: str | None = None
) -> DataFrame:
    """(shard?, bin, cnt): fixed-width integer-bin histogram — the
    mergeable quantile sketch for integer-valued columns. bin =
    value div bin_width (integer division; values must be >= 0), so
    every engine bins identically and two histograms merge by summing
    counts per bin. With ``group_col`` the histogram is built per shard
    (source, day, ...) — the 100 TB shape: each shard histograms its own
    data locally, and ``merge_histograms`` combines the bounded bin
    relations without re-reading anything."""
    keys = ([F.col(group_col).alias("shard")] if group_col else []) + [
        F.expr(f"CAST({col} AS BIGINT) div {bin_width}").alias("bin")
    ]
    return df.groupBy(*keys).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))


def merge_histograms(shard_hists: DataFrame) -> DataFrame:
    """Sum per bin across shards — exact: the merged histogram IS the
    histogram a direct global build produces (counts are plain sums)."""
    return shard_hists.groupBy("bin").agg(F.sum("cnt").cast("bigint").alias("cnt"))


def histogram_quantiles(
    hist: DataFrame, bin_width: int, percentiles: tuple[int, ...] = (50, 90, 99)
) -> DataFrame:
    """(p, bin_lo, bin_hi, cum, total): quantiles read off a merged
    histogram — the p-th percentile lies in the first bin whose
    cumulative count reaches ceil(p * total / 100), reported as the
    bin's [lo, hi) value range. The error bound is the bin width, by
    construction; no global sort of the data ever runs (compare
    ``q_percentiles``, the exact form).

    All integer: ``cum >= ceil(p * total / 100)`` is tested as the
    cross-multiplied ``100 * cum >= p * total`` and the cumulative sum
    orders by the integer bin id. The cumulative window runs over the
    BIN relation (bounded by value-range / bin_width), never over
    data."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("bin").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w).cast("bigint"))
        .crossJoin(
            F.broadcast(hist.agg(F.sum("cnt").cast("bigint").alias("total")))
        )
    )
    p_df = cum.sparkSession.createDataFrame(
        [(int(p),) for p in percentiles], "p INT"
    )
    hit = (
        cum.join(
            F.broadcast(p_df),
            F.lit(100) * F.col("cum") >= F.col("p") * F.col("total"),
        )
    )
    w_first = Window.partitionBy("p").orderBy(F.col("bin").asc())
    return (
        hit.withColumn("__rn", F.row_number().over(w_first))
        .filter(F.col("__rn") == 1)
        .select(
            "p",
            (F.col("bin") * bin_width).cast("bigint").alias("bin_lo"),
            ((F.col("bin") + 1) * bin_width).cast("bigint").alias("bin_hi"),
            "cum",
            "total",
        )
    )
