"""Deterministic sampling and split assignment for training-data
pipelines.

``df.sample()`` is the wrong tool for corpus work: it is seeded per
partition, so the SAME row flips in/out when file splits, partition
counts, or Spark versions change. Everything here derives membership
from a content hash of the row's key instead — fully reproducible across
engines, re-runs, and repartitioning, and joinable (two tables sampled
on the same key agree on membership).

Scale: all pure column expressions (md5 + integer ops, whole-stage
codegen); a sampled scan stays a scan with a cheap filter — no shuffle,
no state. Per-group sampling is one WindowGroupLimit (running top-k per
partition, never materializing full groups).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from md5 of the key's string
    form. Two hex bytes give 65,536 raw values — granular enough for
    percent-level rates while staying engine-portable (DuckDB computes
    the identical md5 on the identical string)."""
    raw = F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")
    return raw % n_buckets


def split_assign(
    key: Column,
    weights: Sequence[tuple[str, int]] = (("train", 90), ("val", 5), ("test", 5)),
) -> Column:
    """Named split from hash-bucket ranges, e.g. 90/5/5. Weights must sum
    to 100. Membership is a pure function of the key: adding rows later
    never reshuffles existing assignments (the property that keeps a
    held-out set held out across corpus refreshes)."""
    total = sum(w for _, w in weights)
    assert total == 100, f"split weights must sum to 100, got {total}"
    bucket = hash_bucket(key, 100)
    expr = None
    cum = 0
    for name, w in weights[:-1]:
        cum += w
        branch = bucket < cum
        expr = (
            F.when(branch, F.lit(name))
            if expr is None
            else expr.when(branch, F.lit(name))
        )
    last = weights[-1][0]
    return expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)


def sample_fraction(df: DataFrame, key: str, percent: int) -> DataFrame:
    """Keep ~percent% of rows, deterministically by key hash."""
    assert 0 <= percent <= 100
    return df.filter(hash_bucket(F.col(key), 100) < percent)


def mixture_sample(
    df: DataFrame,
    source_col: str,
    key: str,
    weights: dict[str, int],
) -> DataFrame:
    """Deterministic corpus mixing: downsample sources so the output hits
    target mixture proportions (DoReMi-style static weights).

    Given integer weights w_s (sources absent from ``weights`` are
    excluded), the largest total T is found such that every source can
    supply its share (T = min_s floor(n_s * W / w_s), W = sum w_s), then
    each source keeps its quota k_s = floor(w_s * T / W) — the docs with
    the lowest md5 rank, so membership is content-deterministic like
    every sampler here.

    The min runs over the WEIGHTS table, not the sources present in the
    data: a weighted source with zero rows contributes n_s = 0 and forces
    T = 0 (empty output), which is the only answer consistent with
    "every source can supply its share". Sources in the data but not in
    ``weights`` are still excluded.

    Scale: the per-source counts and quotas are a vocabulary-of-sources-
    sized table (broadcast); the corpus itself pays one source-keyed
    window rank. All quota math is integer (DIV), exact on any engine.
    Output: df columns + ``rank`` (1-based within source, md5 order).
    """
    assert weights and all(w > 0 for w in weights.values())
    total_w = sum(weights.values())
    wtab = df.sparkSession.createDataFrame(
        list(weights.items()), schema=f"{source_col} string, w int"
    )
    cnt = (
        wtab.join(
            df.groupBy(source_col).agg(F.count(F.lit(1)).alias("__n")),
            on=source_col,
            how="left",
        )
        .select(
            source_col,
            "w",
            F.coalesce(F.col("__n"), F.lit(0)).alias("n"),
        )
    )
    cap = cnt.select(
        F.min(F.expr(f"n * {total_w} DIV w")).alias("t_total")
    )
    quota = (
        cnt.crossJoin(F.broadcast(cap))
        .select(
            F.col(source_col),
            F.expr(f"w * t_total DIV {total_w}").alias("quota"),
        )
    )
    w_rank = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    return (
        df.join(F.broadcast(quota), source_col)
        .withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rank") <= F.col("quota"))
        .drop("quota")
    )


def global_shuffle(df: DataFrame, key: str, n_shards: int = 8) -> DataFrame:
    """Deterministic global shuffle for training-shard export: every row
    gets a (shard, position) derived purely from its key's md5, so the
    "random" order is reproducible bit-for-bit across runs, engines and
    cluster sizes — the property epoch-stable training data needs.

    Plans as one hash-partitioned exchange (by shard) + per-shard sort;
    at 100 TB that is the minimum possible work for a global permutation,
    and each shard sorts independently (no global ordering bottleneck).
    Writers chain ``.repartition(n_shards, "shard")`` +
    ``sortWithinPartitions("position")`` to stream shards straight to
    files."""
    h = F.md5(F.col(key).cast("string"))
    shard = (hash_bucket(F.col(key), n_shards)).cast("int").alias("shard")
    w = Window.partitionBy("shard").orderBy(F.col("__h").asc(), F.col(key).asc())
    return (
        df.withColumn("__h", h)
        .withColumn("shard", shard)
        .withColumn("position", F.row_number().over(w).cast("bigint"))
        .drop("__h")
    )


def sample_per_group(
    df: DataFrame, group_cols: Sequence[str], key: str, k: int
) -> DataFrame:
    """k deterministic pseudo-random rows per group: rank by the key's
    md5 (uniform, content-derived) with the key itself as tie-break.
    Plans as WindowGroupLimit — a running top-k inside each hash
    partition, so a group with millions of rows never materializes."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def stratified_split(
    df: DataFrame,
    strata_cols: Sequence[str],
    key: str,
    weights: Sequence[tuple[str, int]] = (("test", 5), ("val", 5), ("train", 90)),
    out: str = "split",
) -> DataFrame:
    """EXACT proportional split within every stratum: each stratum of n
    rows contributes floor(n*w/100) rows to each named bucket (remainder
    to the last), unlike ``split_assign`` whose hash buckets only hit the
    proportions in expectation — the guarantee an eval set stratified by
    language/source needs so no stratum is accidentally unsampled.

    Rows are ranked within their stratum by md5(key) (content-derived
    pseudo-random order, key as tie-break), and assignment compares
    rank*100 against n*cum_weight in exact integer math. One window per
    stratum (hash-partitioned, parallel across strata) plus the stratum
    counts — no global sort, no driver round-trip.

    Reference scope: extends the reference's fixed hold-out filters
    (extract.rkt:96-103 resume ranges) to proportion-guaranteed strata.
    """
    total = sum(w for _, w in weights)
    assert total == 100, f"split weights must sum to 100, got {total}"
    w_rank = Window.partitionBy(*strata_cols).orderBy(
        F.md5(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    w_n = Window.partitionBy(*strata_cols)
    ranked = df.withColumn("__r", F.row_number().over(w_rank).cast("bigint")).withColumn(
        "__n", F.count(F.lit(1)).over(w_n).cast("bigint")
    )
    expr = None
    cum = 0
    for name, w in weights[:-1]:
        cum += w
        branch = F.col("__r") * 100 <= F.col("__n") * cum
        expr = (
            F.when(branch, F.lit(name))
            if expr is None
            else expr.when(branch, F.lit(name))
        )
    last = weights[-1][0]
    assigned = expr.otherwise(F.lit(last)) if expr is not None else F.lit(last)
    return ranked.withColumn(out, assigned).drop("__r", "__n")


def global_rank(
    df: DataFrame,
    order_cols: Sequence[str],
    out: str = "rank",
    num_ranges: int | None = None,
    total_out: str | None = None,
) -> DataFrame:
    """Exact 1-based global rank over a TOTAL order (pass a unique
    tie-break — e.g. the primary key — as the last order column), without
    the single-reducer ``Window.orderBy()`` collapse.

    Two-phase, keyed on the LEADING order column's values: rank locally
    inside each leading-value group (hash-partitioned windows, parallel
    across values), then add the cumulative count of all smaller values.
    The offset relation has one row per DISTINCT leading value — its
    cumsum window is bounded by that domain, never by the data — and
    broadcasts back. Fully DETERMINISTIC: no sampling anywhere, so two
    consumers of the plan can never disagree. (The tempting alternative
    — ``repartitionByRange`` + ``spark_partition_id`` — derives range
    boundaries from a per-materialization RANDOM sample; when the
    offsets subtree and the rank subtree materialize that exchange
    separately, their boundaries differ and the assembled ranks are
    silently wrong. Caught at sf0.1 by the composed-pipeline oracle.)

    Contract: the leading order column should be a bounded-cardinality
    value (a length, a score, a date) with non-null values — exactly the
    shape curriculum binning ranks on. NULLs are a cross-engine trap on
    purpose excluded: Spark ASC sorts NULLS FIRST, DuckDB NULLS LAST,
    so a nullable rank key cannot hash-match an oracle either way. A
    UNIQUE leading key degenerates the offset relation to data size; at
    that point a global sort is the honest plan. ``num_ranges`` is
    accepted for API compatibility and ignored.

    ``total_out`` additionally attaches the TOTAL row count as a column
    of that name, computed in the same bounded-domain window pass over
    the counts relation — so a caller needing rank AND total (rank_bins)
    never pays a third full-input aggregate subtree for one scalar.
    """
    lead = order_cols[0]
    rest = list(order_cols[1:])
    counts = df.groupBy(lead).agg(F.count(F.lit(1)).alias("__cnt"))
    w_cum = Window.orderBy(F.col(lead).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    off_cols = [
        F.col(lead),
        F.coalesce(F.sum("__cnt").over(w_cum), F.lit(0)).alias("__off"),
    ]
    if total_out is not None:
        w_all = Window.orderBy(F.col(lead).asc()).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        off_cols.append(F.sum("__cnt").over(w_all).cast("bigint").alias(total_out))
    offsets = counts.select(*off_cols)
    w_local = Window.partitionBy(lead).orderBy(
        *[F.col(c).asc() for c in (rest or [lead])]
    )
    return (
        df.join(F.broadcast(offsets), lead)
        .withColumn(
            out, (F.col("__off") + F.row_number().over(w_local)).cast("bigint")
        )
        .drop("__off")
    )


def rank_bins(
    df: DataFrame,
    order_cols: Sequence[str],
    n_bins: int = 10,
    out: str = "bin",
) -> DataFrame:
    """Equal-count curriculum bins 1..n_bins over a deterministic total
    order: bin = (rank-1)*n_bins div n + 1 — the engine-portable even
    distribution (SQL NTILE's remainder placement differs between
    engines' documentation and is avoided on purpose).

    Rank comes from ``global_rank`` (deterministic two-phase over the
    leading value's domain, no global sort) with the total attached in
    the same bounded-domain offsets pass (``total_out``) — the previous
    separate 1-row count agg planned the ENTIRE input subtree a third
    time just to produce n, which for composed callers (q_curation_build:
    span_dedup -> split -> bins) re-ran the whole upstream pipeline.
    Length or quality binning feeds curriculum schedules and balanced
    batch packing."""
    ranked = global_rank(df, order_cols, out="__rank", total_out="__total")
    return (
        ranked.withColumn(
            out,
            F.expr(f"CAST((__rank - 1) * {n_bins} div __total + 1 AS INT)"),
        )
        .drop("__rank", "__total")
    )


def token_budget_sample(
    df: DataFrame,
    source_col: str,
    token_col: str,
    key: str,
    budgets: DataFrame,
    out: str = "cum_tokens",
) -> DataFrame:
    """Budgeted admission per source in TOKENS, not documents: rows are
    hash-ordered within their source (content-derived, epoch-stable) and
    admitted while the running token total stays within the source's
    budget — the mixture knob training recipes actually specify ("20B
    tokens of web, 5B of code"), where ``mixture_sample``'s document
    quotas misweight sources with different document lengths.

    Admission is the PREFIX of the hash order whose cumulative sum fits:
    the first over-budget row and everything after it are excluded, so
    membership is deterministic and insensitive to partitioning, and a
    re-run over a grown corpus keeps all previously admitted rows whose
    hash rank precedes any newcomer (same stability argument as
    ``split_assign``).

    ``budgets`` is a (source, budget_tokens) relation — dimension-sized,
    broadcast. One window per source (parallel across sources), running
    cumulative sum only — no second pass, no driver state. Emits the
    admitted rows plus ``cum_tokens`` (the running total INCLUDING the
    row) for packing/audit downstream."""
    w = Window.partitionBy(source_col).orderBy(
        F.md5(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        df.withColumn(out, cum.cast("bigint"))
        .join(F.broadcast(budgets), source_col)
        .filter(F.col(out) <= F.col("budget_tokens"))
        .drop("budget_tokens")
    )


def systematic_weighted_sample(
    df: DataFrame, key: str, weight_col: str, step: int
) -> DataFrame:
    """Weight-proportional systematic sampling: lay every row's weight
    end-to-end along a deterministic hash order and keep the rows whose
    interval covers a multiple of ``step``. Each row is selected with
    probability ~weight/step (rows with weight >= step are ALWAYS kept),
    and the sample totals ~total_weight/step rows — the
    token-proportional document sample a "sample N tokens" recipe needs,
    where uniform row sampling would over-represent short documents.

    Membership is a pure function of (corpus content, step): the order
    is (md5(key), key) and the test is the integer-division flip
    ``(cum - w) div step < cum div step`` on exact cumulative sums — no
    float, no RNG, identical on every engine.

    The global cumulative sum runs TWO-PHASE like ``global_rank``: rows
    are grouped by their md5's leading byte (256 buckets), summed within
    each bucket's hash-partitioned window, and offset by the 256-row
    bucket-total cumsum (broadcast) — no single-reducer window over the
    data at any scale."""
    h = F.md5(F.col(key).cast("string"))
    bucketed = df.withColumn("__b", F.substring(h, 1, 2))
    w_local = Window.partitionBy("__b").orderBy(
        F.md5(F.col(key).cast("string")).asc(), F.col(key).asc()
    )
    local = bucketed.withColumn(
        "__lcum",
        F.sum(F.col(weight_col))
        .over(w_local.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    totals = bucketed.groupBy("__b").agg(
        F.sum(F.col(weight_col)).cast("bigint").alias("__bt")
    )
    w_off = Window.orderBy(F.col("__b").asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__b", F.coalesce(F.sum("__bt").over(w_off), F.lit(0)).cast("bigint").alias("__off")
    )
    return (
        local.join(F.broadcast(offsets), "__b")
        .withColumn("cum_weight", (F.col("__off") + F.col("__lcum")).cast("bigint"))
        .filter(
            F.expr(
                f"(cum_weight - {weight_col}) div {step} < cum_weight div {step}"
            )
        )
        .drop("__b", "__lcum", "__off")
    )


def temperature_weights(
    df: DataFrame,
    group_col: str,
    alpha_quarters: int = 2,
    size_col: str | None = None,
) -> DataFrame:
    """Temperature-based mixture weights (mT5 / XLM-R alpha-sampling):
    per group (language, source), the sampling share p_g proportional to
    n_g^alpha — the standard rebalancing that up-samples low-resource
    slices without letting the head slice drown them. Output: (group,
    n, n_rows, nat_bp, weight_bp) with nat_bp the natural share and
    weight_bp the temperature share, both floor-scaled basis points.

    ``alpha_quarters`` is alpha in quarters — 1, 2, or 3 (0.25 / 0.5 /
    0.75). Alpha is restricted to quarters BECAUSE of cross-engine
    exactness: IEEE sqrt is correctly rounded (pow is not), so
    n^(1/4) = sqrt(sqrt(n)), n^(1/2) = sqrt(n), and
    n^(3/4) = sqrt(n) * sqrt(sqrt(n)) are fixed compositions of
    correctly-rounded ops that every engine evaluates identically; a
    general libm pow() would drift by last-ulp and break value-hash
    parity. The denominator Σ_g n_g^alpha is summed by a LEFT FOLD over
    the group-name-sorted array (double addition is not associative, so
    the fold order is pinned; group counts are bounded, the array is
    one row).

    Scale: per-group sizes are a groups-sized aggregate (one map-side-
    combined shuffle of the corpus); everything after is arithmetic on
    that tiny relation — the weights table then broadcasts wherever the
    mixture is applied (e.g. as ``mixture_sample`` weights)."""
    assert alpha_quarters in (1, 2, 3), "alpha must be 1, 2, or 3 quarters"
    size = F.sum(F.col(size_col)) if size_col else F.count(F.lit(1))
    sizes = df.groupBy(group_col).agg(
        size.cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    root = F.sqrt(F.col("n").cast("double"))
    root4 = F.sqrt(root)
    s = {1: root4, 2: root, 3: root * root4}[alpha_quarters]
    with_s = sizes.withColumn("__s", s)
    packed = with_s.agg(
        F.sum("n").cast("bigint").alias("__tn"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct(group_col, "__s"))),
                lambda e: e["__s"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("__ts"),
    )
    return (
        with_s.crossJoin(F.broadcast(packed))
        .select(
            group_col,
            "n",
            "n_rows",
            F.expr("CAST(10000 * n div __tn AS BIGINT)").alias("nat_bp"),
            F.floor(F.lit(10000.0) * F.col("__s") / F.col("__ts"))
            .cast("bigint")
            .alias("weight_bp"),
        )
    )


def priority_sample(
    df: DataFrame, key: str, weight_col: str, k: int
) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup 2007): a fixed-size-k
    weight-biased sample with per-item Horvitz-Thompson weight
    estimates, fully deterministic and integer-exact.

    Each row draws a content-hash uniform u in [1, 2^52] (first 13 hex
    chars of md5(key) — no RNG, reproducible across engines and
    repartitioning) and gets priority q = w * 2^50 div u (the integer
    form of w/u, monotone in it; ties broken by key). The k LARGEST
    priorities are the sample; the (k+1)-th is the threshold tau, and
    every selected row's weight estimate is max(w, floor-scaled tau
    inverse) — emitted here as the raw integer (w, priority, tau) triple
    so downstream estimators stay exact. Expected inclusion probability
    is ~min(1, w/tau_w): heavy rows are always kept, light rows
    proportionally to weight — the "keep exactly k documents,
    token-biased" primitive a budgeted corpus sample needs (fixed k,
    where ``systematic_weighted_sample`` fixes the STEP instead).

    Integer discipline: u is 52 bits, w*2^50 stays under 2^63 for
    weights to ~8000, and every division is bigint ``div`` — no double
    anywhere (a ``/`` on bigints would silently round above 2^53), no
    decimal rounding ahead of a floor. The scaled-unit outputs keep
    downstream estimators exact: ``w_est_sc div 2^50`` recovers the
    natural-unit HT estimate max(w, tau) when a float is acceptable.

    Scale: ordering by priority plans as TakeOrderedAndProject
    (per-partition top-(k+1) + driver k-merge) — no global sort, no
    full shuffle; the threshold broadcast back is one row."""
    u = (
        F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 13), 16, 10)
        .cast("bigint")
        + 1
    )
    w = F.col(weight_col).cast("bigint")
    ranked = (
        df.select(
            F.col(key),
            w.alias("w"),
            (w * F.lit(1 << 50)).alias("__ws"),
            u.alias("__u"),
        )
        .withColumn("priority", F.expr("__ws div __u"))
        .select(key, "w", "priority")
        .orderBy(F.col("priority").desc(), F.col(key).asc())
        .limit(k + 1)
    )
    # topk by explicit rank over the (k+1)-row candidate set — never a
    # nested .limit(k) leaning on order preservation through limits.
    # The single-partition window is fine: it sees at most k+1 rows.
    rank_w = Window.orderBy(F.col("priority").desc(), F.col(key).asc())
    topk = (
        ranked.withColumn("__rn", F.row_number().over(rank_w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    tau = ranked.orderBy(F.col("priority").asc(), F.col(key).desc()).limit(1)
    return topk.crossJoin(
        F.broadcast(tau.select(F.col("priority").alias("tau")))
    ).select(
        F.col(key),
        F.col("w"),
        F.col("priority"),
        F.col("tau"),
        # HT estimate in 2^50-scaled units: max(w, tau_natural) * 2^50
        F.greatest(F.col("w") * F.lit(1 << 50), F.col("tau")).alias("w_est_sc"),
    )


def source_calibration(
    df: DataFrame,
    source_col: str,
    order_cols: Sequence[str],
    n_bins: int = 10,
) -> DataFrame:
    """Cross-source score calibration audit: every row gets its
    WITHIN-SOURCE equal-count bin and its GLOBAL bin over the same
    deterministic order, and the audit is the (source, src_bin,
    global_bin, n_rows) contingency matrix. A well-calibrated scorer
    concentrates mass on the diagonal; a source whose bin-5 rows land
    in global bin-9 is scoring on a different scale and must be
    renormalized before a shared quality threshold is applied — the
    classic failure of mixing crawl snapshots with curated sources.

    Exact integers everywhere: both bins are (rank-1)*n_bins div n + 1
    over rank/count (the rank_bins rule), never NTILE. Scale: the
    global side is rank_bins' two-phase rank (no global sort); the
    per-source side is one source-partitioned window; the matrix
    reduces to at most |sources|·n_bins² rows."""
    g = rank_bins(df, list(order_cols), n_bins=n_bins, out="__gbin")
    w = Window.partitionBy(source_col).orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    binned = (
        g.withColumn("__srank", F.row_number().over(w))
        .withColumn(
            "__sn", F.count(F.lit(1)).over(Window.partitionBy(source_col))
        )
        .withColumn(
            "__sbin",
            F.expr(f"CAST((__srank - 1) * {n_bins} div __sn + 1 AS INT)"),
        )
    )
    return (
        binned.groupBy(
            F.col(source_col),
            F.col("__sbin").alias("src_bin"),
            F.col("__gbin").alias("global_bin"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    )
