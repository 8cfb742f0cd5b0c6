"""Distributed Lloyd k-means over an embedding column, plus the IVF
coarse-quantizer retrieval built on it.

The reference engine has no clustering operator; this extends the
training-data surface (SURVEY.md extensions): k-means is the standard
coarse quantizer for IVF approximate-nearest-neighbor (FAISS-style) and
the standard domain-discovery step over document embeddings.

Cross-engine exactness design (the whole point of this layout):

- Embeddings are quantized once: ``q = floor(x * 4096)`` per element.
  4096 is a power of two, so the multiply is exact in IEEE double and
  the floor is engine-independent.
- All cross-row state is INTEGER: centroids are kept as per-dimension
  quantized sums ``sarr`` plus a member count ``n`` (the true centroid
  is the rational sarr/n, never materialized as a float). Integer sums
  are order-independent, so the result cannot drift with partitioning,
  speculative re-execution, or AQE re-planning — and matches a DuckDB
  oracle bit-for-bit.
- Distance uses the expansion  ||x - s/n||^2 = a - 2*b/n + ss/n^2  with
  a = sum(q^2), b = sum(q*s), ss = sum(s^2) all integers, evaluated in
  ONE fixed-shape double expression (see ``_dist``). IEEE +,-,*,/ with
  identical operand order gives identical doubles on every engine, so
  argmin assignments agree everywhere. Ties break to the lowest cid.

Shuffle budget per Lloyd iteration (the 100 TB shape):

- Assignment is a PURE PROJECTION: the k centroids are collapsed into a
  single-row array and broadcast, and the argmin is a per-row
  ``aggregate`` fold over that array — zero shuffle, stays in codegen.
- The update is one ``posexplode`` + ``groupBy(cid, pos)`` — n*dim rows
  partially aggregated map-side down to k*dim per task, so the exchange
  carries ~k*dim*tasks rows, not data-sized.

``ss = sum_pos(s_p^2)`` is computed in decimal(38,0): a single squared
per-dimension sum s_p^2 passes int64 once a cluster's quantized sum
exceeds ~3e9 (≈ 750k members at |x| <= 1 and QUANT=4096), and DuckDB's
SUM(BIGINT) widens to HUGEINT anyway — decimal keeps the Spark side
exact and order-independent at any cluster size, matching the oracle.
It is cast to double only inside ``_dist`` (same double either way) and
consumed exactly by the decimal probe ranking.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 4096  # power of two: float * QUANT is exact in IEEE double


def quantize(embeddings: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, qarr) with qarr[i] = floor(embedding[i] * 4096) as bigint."""
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(vec_col, lambda x: F.floor(x.cast("double") * QUANT)).alias("qarr"),
    )


def _fold_sum_long(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0).cast("bigint"), lambda acc, v: acc + v)


def _dist(a: Column, b: Column, n: Column, ss: Column) -> Column:
    """||x - s/n||^2 from integer moments. KEEP THE SHAPE IN SYNC with the
    oracle SQL in queries/clustering.py: a - 2.0*b/n + ss/(n*n), all
    operands cast to double first, left-to-right evaluation."""
    nd = n.cast("double")
    return a.cast("double") - F.lit(2.0) * b.cast("double") / nd + ss.cast("double") / (nd * nd)


def _dec(c: Column) -> Column:
    return c.cast("decimal(38,0)")


def _centroid_state(assigned: DataFrame) -> DataFrame:
    """(cid, sarr, n, ss) from (vec_id, qarr, cid) member rows.

    One narrow exchange: posexplode to (cid, pos, q), groupBy(cid, pos)
    with map-side partial sums, then re-assemble per-cid arrays.
    """
    long = assigned.select("cid", F.posexplode("qarr").alias("pos", "q"))
    sums = long.groupBy("cid", "pos").agg(F.sum("q").alias("s"))
    # ss in decimal(38,0): s^2 passes int64 for clusters past ~750k
    # members, and the DuckDB oracle's SUM(BIGINT) widens to HUGEINT —
    # decimal keeps this side exact at any cluster size
    arrays = sums.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))), lambda e: e["s"]
        ).alias("sarr"),
        F.sum(_dec(F.col("s")) * _dec(F.col("s"))).alias("ss"),
    )
    counts = assigned.groupBy("cid").agg(F.count("*").alias("n"))
    return arrays.join(counts, "cid")


def assign_clusters(qv: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, qarr, cid): argmin-distance assignment as a pure projection.

    The k centroids are collapsed to ONE row holding a cid-sorted array
    of (cid, sarr, n, ss) structs, broadcast, and folded per input row —
    no shuffle, no window. Strict ``<`` over the cid-ascending array
    breaks distance ties toward the lowest cid (mirrors the oracle's
    ``ORDER BY d, cid``).
    """
    packed = centroids.agg(
        F.array_sort(F.collect_list(F.struct("cid", "sarr", "n", "ss"))).alias("cents")
    )
    a = _fold_sum_long(F.zip_with("qarr", "qarr", lambda x, y: x * y))
    with_a = qv.withColumn("a", a).crossJoin(F.broadcast(packed))

    def scored(c: Column) -> Column:
        b = _fold_sum_long(F.zip_with(F.col("qarr"), c["sarr"], lambda x, y: x * y))
        d = _dist(F.col("a"), b, c["n"], c["ss"])
        return F.struct(d.alias("d"), c["cid"].alias("cid"))

    # transform + array_min computes each centroid distance ONCE; a
    # fold with when/otherwise branches evaluates it twice per step
    # (condition + kept value) — measured ~2x on this interpreted-HOF
    # hot loop. Struct ordering (d, then cid) IS the tie-break.
    best = F.array_min(F.transform(F.col("cents"), scored))
    return with_a.select("vec_id", "qarr", best["cid"].alias("cid"))


def kmeans_fit(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` Lloyd iterations; return (assignments, centroids).

    assignments: (vec_id, qarr, cid); centroids: (cid, sarr, n, ss).
    Init is deterministic: the k rows with the lowest ids ACTUALLY
    PRESENT seed singleton clusters (cid = seed vec_id) — a sort-limit
    (TakeOrderedAndProject: per-partition top-k, k-sized merge), so the
    seed count is exactly min(k, n_rows) on any id space, dense or
    sparse. A cluster that loses all members drops out (standard Lloyd
    degeneracy — inner joins on both engines agree).

    The loop builds one lazy plan; centroid subtrees are k rows, so plan
    growth is the only cost of staying fully declarative. For deep
    iteration counts persist the (tiny) centroid state per round.
    """
    if iters < 1:
        raise ValueError(f"kmeans_fit requires iters >= 1, got {iters}")
    qv = quantize(embeddings, id_col, vec_col)
    seeds = qv.orderBy("vec_id").limit(k)
    # each centroid state is k rows but is referenced by every later
    # iteration (and by both consumers of the fit) — cache it so the
    # lineage is evaluated once, not once per reference; the footprint
    # is k * dim longs regardless of corpus size
    centroids = _centroid_state(
        seeds.select("vec_id", "qarr", F.col("vec_id").alias("cid"))
    ).cache()
    assigned = None
    for _ in range(iters):
        assigned = assign_clusters(qv, centroids)
        centroids = _centroid_state(assigned).cache()
    return assigned, centroids


def ivf_probe_cells(centroids: DataFrame, qrow: DataFrame, n_probe: int) -> DataFrame:
    """The ``n_probe`` coarse cells nearest the query, as a (cid)
    relation — shared by IVF-flat (``ivf_kmeans_topk``) and IVF-PQ
    (operators/pq.ivf_pq_topk). ``qrow`` is one row (q_qarr).

    Ranking is EXACT-INTEGER, not double: the cell distance is the
    rational N/n^2 with N = a*n^2 - 2*b*n + ss (all integer moments),
    and cell i ranks ahead of cell j iff N_i*n_j^2 < N_j*n_i^2 — a
    decimal(38,0) cross-multiplication both engines compute identically,
    so a near-tie between cells can never flip the candidate set on a
    last-ulp difference. KEEP IN SYNC with the nq/probe CTEs in
    queries/clustering.py (DuckDB side uses HUGEINT).

    Rank-by-count-ahead over the k cells collapsed into ONE row: cell c
    probes iff fewer than n_probe cells rank strictly ahead of it. The
    nested array filter is k^2 comparisons on k<=tens of cells — one
    projection, no join or aggregation exchange."""
    a_q = _fold_sum_long(F.zip_with("q_qarr", "q_qarr", lambda x, y: x * y))
    scored_cells = centroids.crossJoin(F.broadcast(qrow.withColumn("qa", a_q)))
    b = _fold_sum_long(F.zip_with(F.col("q_qarr"), F.col("sarr"), lambda x, y: x * y))
    ncell = scored_cells.select(
        "cid",
        (
            _dec(F.col("qa")) * _dec(F.col("n")) * _dec(F.col("n"))
            - _dec(F.lit(2)) * _dec(b) * _dec(F.col("n"))
            + _dec(F.col("ss"))
        ).alias("num"),
        (_dec(F.col("n")) * _dec(F.col("n"))).alias("nn"),
    )

    def _ahead(o: Column, c: Column) -> Column:
        return (o["num"] * c["nn"] < c["num"] * o["nn"]) | (
            (o["num"] * c["nn"] == c["num"] * o["nn"]) & (o["cid"] < c["cid"])
        )

    packed_cells = ncell.agg(
        F.collect_list(F.struct("cid", "num", "nn")).alias("cells")
    )
    return packed_cells.select(
        F.explode(
            F.filter(
                "cells",
                lambda c: F.size(
                    F.filter("cells", lambda o: _ahead(o, c))
                ) < n_probe,
            )
        ).alias("cell")
    ).select(F.col("cell.cid").alias("cid"))


def ivf_kmeans_topk(
    embeddings: DataFrame,
    query_id: int,
    k: int = 8,
    iters: int = 2,
    n_probe: int = 2,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF retrieval with a k-means coarse quantizer: probe the query's
    ``n_probe`` nearest cells, exact-rank only their members.

    (vec_id, dist, rank): dist is the EXACT integer squared distance in
    quantized space — sum((qx-qy)^2) — so the output is hash-stable with
    no float in the final schema. At scale the win is the probe
    semi-join: only n_probe/k of the corpus is scanned for ranking, and
    both the probe list and the query vector are broadcast.
    """
    assigned, centroids = kmeans_fit(embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col)

    # the query row needs only its quantized vector — read it off the
    # scan, not off the full fit lineage
    qrow = (
        quantize(embeddings, id_col, vec_col)
        .filter(F.col("vec_id") == query_id)
        .select(F.col("qarr").alias("q_qarr"))
    )
    probe = ivf_probe_cells(centroids, qrow, n_probe)

    cand = (
        assigned.join(F.broadcast(probe), "cid", "semi")
        .filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(qrow))
    )
    dist = _fold_sum_long(
        F.zip_with(F.col("qarr"), F.col("q_qarr"), lambda x, y: (x - y) * (x - y))
    )
    # sort-limit first (TakeOrderedAndProject: per-partition top-k then a
    # k-sized merge), THEN rank the k survivors — the only
    # single-partition stage touches topk rows, not the probed cells
    top = cand.select("vec_id", dist.alias("dist")).orderBy("dist", "vec_id").limit(topk)
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy("dist", "vec_id")).cast("int")
    )


def _auto_sub_bits(n_rows: int, k: int) -> int:
    """Default sub-LSH width for ``semantic_dedup``: 0 (exact
    within-cell pairing) while the EXPECTED cell n/k fits the shared
    bucket target, else ``similarity.bits_for`` of the cell size — the
    split that keeps pair groups ~target-rows as the corpus grows."""
    from oic_options_chains_spark.operators.similarity import (
        DEFAULT_TARGET_BUCKET_ROWS,
        bits_for,
    )

    expected_cell = n_rows / max(k, 1)
    if expected_cell <= DEFAULT_TARGET_BUCKET_ROWS:
        return 0
    return bits_for(int(expected_cell))


def _cell_pair_distances(assigned: DataFrame, sub_bits: int) -> DataFrame:
    """(cid, vid_hi, vid_lo, d): exact integer distances of every
    within-cell (optionally sub-LSH-restricted) ordered pair — the
    pairing core shared by ``semantic_dedup`` (fixed eps) and
    ``semantic_dedup_auto_eps`` (quantile-derived eps). Salted on the
    cell key (see semantic_dedup docstring)."""
    from oic_options_chains_spark.operators.skew import salted_join

    keys = ["cid"]
    if sub_bits > 0:
        sub = F.concat(
            *[
                F.when(F.element_at(F.col("qarr"), i + 1) > 0, F.lit("1")).otherwise(
                    F.lit("0")
                )
                for i in range(sub_bits)
            ]
        )
        assigned = assigned.withColumn("__sub", sub)
        keys = ["cid", "__sub"]
    a = assigned.select(
        *keys,
        F.col("vec_id").alias("vid_hi"),
        F.col("qarr").alias("q_hi"),
    )
    b_side = assigned.select(
        *keys,
        F.col("vec_id").alias("vid_lo"),
        F.col("qarr").alias("q_lo"),
    )
    pairs = salted_join(a, b_side, keys, left_salt_from="vid_hi").filter(
        F.col("vid_lo") < F.col("vid_hi")
    )
    d = _fold_sum_long(
        F.zip_with(F.col("q_hi"), F.col("q_lo"), lambda x, y: (x - y) * (x - y))
    )
    return pairs.select("cid", "vid_hi", "vid_lo", d.alias("d"))


def semantic_dedup(
    embeddings: DataFrame,
    eps: int,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sub_bits: int | None = None,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): cluster embeddings with k-means,
    then drop any vector whose cluster holds a LOWER-id vector within
    squared quantized distance ``eps``. Returns the dropped rows only:
    (vec_id, cid, keeper, dist) with ``keeper`` the smallest such
    neighbor and ``dist`` the exact integer distance to it.

    This is the scale path for embedding-level near-dedup: the
    within-cluster self-join is the ONLY pairing ever formed, so work is
    sum(cluster_size^2), not corpus^2 — the clustering exists precisely
    to bound the candidate space (same role the LSH bands play for
    MinHash). At 100 TB: raise k until clusters bound memory; the join
    shuffles both sides once on cid.

    Every decision is integer: assignments are the shared exact-moment
    argmin (``assign_clusters``), the distance is sum((qa-qb)^2) over
    quantized vectors, eps-comparison and keeper-argmin are integer
    folds. Keeper rule "smallest qualifying id" (not transitive closure)
    keeps the operator one join + one aggregate; chained duplicates
    resolve over the keeper graph exactly like ``clusters.dedup_clusters``
    downstream if closure is needed.

    The pairing join is SALTED (``operators/skew.salted_join``): cid has
    only k distinct values, so an unsalted cid join caps reducer
    parallelism at k regardless of cluster size — exactly the
    hot-key-feeding-a-join case AQE cannot rewrite (the pair-forming
    fold is CPU-dense, not bytes-dense). Salting the hi side by row id
    splits each cell across n_salts reducers at the cost of replicating
    the lo side n_salts times; results are row-identical by the salting
    contract.

    ``sub_bits`` is the 100 TB knob the scale curve validated: with
    fixed k, cells grow linearly with the corpus and the within-cell
    pairing is O(n²/k) — superlinear. Raising k instead pushes the
    Lloyd fit superlinear (assignment is O(n·k·d); measured WORSE at
    10x data than fixed k). ``sub_bits > 0`` keeps the cheap fixed-k
    fit and splits each cell's pairing by a sign-LSH bucket of the
    leading ``sub_bits`` quantized dims: pair groups stay ~target-rows,
    cost O(n · E[bucket]). The trade is recall at sub-bucket
    boundaries — the same miss class as SemDeDup's own cell boundaries.

    DEFAULT (``sub_bits=None``) derives the split from the EXPECTED
    CELL size, ceil(log2((n/k)/target)) with target =
    ``similarity.DEFAULT_TARGET_BUCKET_ROWS``: 0 (exact within-cell
    pairing) while cells fit an executor, growing log2 with the corpus
    after that — so the default path is scale-safe (measured slope
    1.18 exact vs 0.34 sub-LSH at 10x data, SCALE_CURVE round 6)
    while small/gate-scale corpora keep the exact oracle-checked
    behavior bit-for-bit. Pin ``sub_bits=0`` for the verification
    form, or an explicit width for oracle determinism at scale."""
    if sub_bits is None:
        sub_bits = _auto_sub_bits(embeddings.count(), k)
    assigned, _ = kmeans_fit(embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    close = _cell_pair_distances(assigned, sub_bits).filter(F.col("d") <= eps)
    best = close.groupBy("vid_hi", "cid").agg(
        F.min("vid_lo").alias("keeper"),
        F.min_by("d", "vid_lo").alias("dist"),
    )
    return best.select(
        F.col("vid_hi").alias("vec_id"),
        "cid",
        F.col("keeper").cast("bigint").alias("keeper"),
        F.col("dist").cast("bigint").alias("dist"),
    )


def centroid_probe(
    embeddings: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid probe (the standard linear-probe-without-a-model
    eval for embedding quality): build one centroid per LABEL from the
    labeled vectors, re-assign every vector to its nearest label
    centroid with the shared exact-moment argmin, and emit the confusion
    matrix (label, predicted, n_vecs). A good embedding space reproduces
    its labels from centroids alone; off-diagonal mass localizes the
    confusable classes — the report a curation pipeline reads before
    trusting embeddings for semantic dedup or retrieval.

    Same machinery as the quantizer fit: centroids are
    ``_centroid_state`` over label groups (one map-side-combined
    (cid, pos) exchange), assignment is the broadcast-fold projection
    (zero shuffle), and the confusion aggregate is labels² rows. Every
    decision is the fixed-shape integer-moment distance, so the matrix
    is bit-identical on any engine/partitioning."""
    qv = quantize(embeddings, id_col, vec_col)
    labels = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(label_col).cast("int").alias("label")
    )
    members = qv.join(labels, "vec_id").select(
        "vec_id", "qarr", F.col("label").alias("cid")
    )
    cents = _centroid_state(members)
    assigned = assign_clusters(qv, cents)
    return (
        assigned.join(labels, "vec_id")
        .groupBy("label", F.col("cid").cast("int").alias("predicted"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
    )


def semantic_dedup_auto_eps(
    embeddings: DataFrame,
    pct_bp: int = 100,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sub_bits: int | None = None,
) -> DataFrame:
    """SemDeDup with the eps threshold DERIVED from the corpus itself:
    eps = the exact ``pct_bp``-basis-point lower order statistic of the
    within-cell pair-distance distribution (position max(1,
    (n_pairs * pct_bp) div 10000) under the total order (d, hi, lo)).

    Why: a fixed eps is a per-corpus magic number — the right threshold
    at 100 TB moves with the embedding model, the quantization, and the
    corpus's self-similarity. "Drop the closest 1% of pairs" is the
    operational contract curation actually wants, and the order
    statistic makes it exact and engine-replayable (no float quantile
    interpolation).

    Scale: the pair relation is the same bounded within-cell pairing as
    ``semantic_dedup`` (never corpus²); the order statistic uses the
    two-phase ``global_rank`` (keyed on the distance value domain — no
    single-reducer global sort), and the 1-row eps broadcasts back.

    Returns the dropped rows (vec_id, cid, keeper, dist, eps) — eps
    included so downstream audit sees the threshold that was applied."""
    from oic_options_chains_spark.operators.sampling import global_rank

    if sub_bits is None:
        sub_bits = _auto_sub_bits(embeddings.count(), k)
    assigned, _ = kmeans_fit(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    dists = _cell_pair_distances(assigned, sub_bits).localCheckpoint(eager=True)
    ranked = global_rank(dists, ["d", "vid_hi", "vid_lo"], out="__rank")
    n = dists.agg(F.count(F.lit(1)).cast("bigint").alias("__n"))
    eps_row = (
        ranked.crossJoin(F.broadcast(n))
        .filter(
            F.col("__rank")
            == F.greatest(F.lit(1), F.expr(f"__n * {pct_bp} div 10000"))
        )
        .select(F.col("d").alias("eps"))
    )
    close = dists.crossJoin(F.broadcast(eps_row)).filter(F.col("d") <= F.col("eps"))
    best = close.groupBy("vid_hi", "cid", "eps").agg(
        F.min("vid_lo").alias("keeper"),
        F.min_by("d", "vid_lo").alias("dist"),
    )
    return best.select(
        F.col("vid_hi").alias("vec_id"),
        "cid",
        F.col("keeper").cast("bigint").alias("keeper"),
        F.col("dist").cast("bigint").alias("dist"),
        F.col("eps").cast("bigint").alias("eps"),
    )
