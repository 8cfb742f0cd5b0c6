"""Near-duplicate detection: shingling, MinHash + LSH banding, SimHash.

Scale design (the 100 TB path):
- Shingles are exploded once, distinct-ed per doc (map-side combine), and
  every downstream op is a groupBy/join on hash-bucketed keys — no pairwise
  O(n^2) comparison ever materializes.
- MinHash uses md5-derived permutations (portable + deterministic across
  engines/versions, unlike murmur3 ``F.hash``); k seeds -> k rows per doc,
  banded into b bands; candidate pairs come from a self-equi-join on
  (band, band_key), which Spark shuffles on the band key — skew-safe
  because identical band keys are exactly the near-duplicates.
- SimHash is 64-bit, carried as four 16-bit words per doc (w0..w3). The
  words ARE the 4x16-bit LSH band keys: candidates come from exact-match
  on any word (``simhash_near_pairs``), with an exact Hamming verify on
  the candidates. By pigeonhole, any pair within Hamming distance 3 of a
  64-bit signature leaves at least one word untouched, so recall at the
  default threshold is exact. A 16-bit signature (the round-1 form) has
  only 2^8 bucket keys — at corpus scale every bucket holds millions of
  docs and the candidate join degenerates toward all-pairs; 16-bit
  band keys give 65,536 buckets per band and signatures that can
  actually separate ~10^9 documents.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.text import tokens


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as an array column; empty array for short docs.

    NOTE: array-lambda form, for use inside array contexts only. Spark
    evaluates higher-order-function lambdas interpreted (outside
    whole-stage codegen) and re-evaluates the ``split`` per element — for
    relational shingling always prefer ``doc_shingles`` (posexplode +
    window lead), which is fully codegen'd and parallelizes after one
    shuffle."""
    toks = tokens(text)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    make = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, make).otherwise(
        F.array().cast("array<string>")
    )


def doc_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, distinct: bool = True
) -> DataFrame:
    """(doc, shingle) pairs via posexplode + window lead.

    One shuffle keyed on the doc id (the window partition); every stage is
    whole-stage-codegen. At cluster scale the token rows are tiny relative
    to the corpus and the id-keyed shuffle spreads CPU-heavy hashing
    across executors regardless of input file splits.

    ``distinct=True`` gives set semantics (required for Jaccard). MinHash
    consumers pass ``distinct=False``: ``min`` is duplicate-insensitive,
    and the doc-id window partitioning already co-locates each doc, so the
    dedup pass is pure cost there."""
    tok = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, n)]
    with_sh = tok.select(
        F.col(id_col),
        F.when(
            F.lead("tok", n - 1).over(w).isNotNull(), F.concat_ws(" ", *parts)
        ).alias("shingle"),
    )
    out = with_sh.filter(F.col("shingle").isNotNull())
    return out.distinct() if distinct else out


def _wide_minhash(shingle_df: DataFrame, id_col: str, num_hashes: int) -> DataFrame:
    """One row per doc with columns ``__h0..__h{k-1}``: all ``num_hashes``
    md5-permutation minima in a single groupBy pass — no k-fold row
    explosion, one shuffle keyed on the doc id."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"__h{i}")
        for i in range(num_hashes)
    ]
    return shingle_df.groupBy(id_col).agg(*aggs)


def minhash_signatures(
    shingle_df: DataFrame, id_col: str, num_hashes: int = 8
) -> DataFrame:
    """(doc, seed, minhash) rows: min over shingles of md5(seed || shingle).

    md5-hex min is order-free and engine-portable. The long shape is
    exploded only after the wide aggregation (k rows per doc).
    """
    wide = _wide_minhash(shingle_df, id_col, num_hashes)
    pairs = F.array(
        *[
            F.struct(
                F.lit(i).alias("seed"), F.col(f"__h{i}").alias("minhash")
            )
            for i in range(num_hashes)
        ]
    )
    return wide.select(F.col(id_col), F.explode(pairs).alias("s")).select(
        F.col(id_col), F.col("s.seed").alias("seed"), F.col("s.minhash").alias("minhash")
    )


def minhash_band_keys(
    shingle_df: DataFrame, id_col: str, num_hashes: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """(doc, band, band_key) rows directly from the wide aggregation.

    Fuses signature + banding: ``lsh_bands`` over the long signature form
    costs a second doc-keyed shuffle plus a ``collect_list`` sort; here the
    band keys are plain ``concat_ws`` over the wide columns, so the whole
    path to LSH buckets is one shuffle. Band keys are identical to
    ``lsh_bands``'s (minhashes joined by ',' in seed order)."""
    assert num_hashes % rows_per_band == 0
    wide = _wide_minhash(shingle_df, id_col, num_hashes)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"__h{b * rows_per_band + j}")
                        for j in range(rows_per_band)
                    ],
                ).alias("band_key"),
            )
            for b in range(num_hashes // rows_per_band)
        ]
    )
    return wide.select(F.col(id_col), F.explode(bands).alias("s")).select(
        F.col(id_col), F.col("s.band").alias("band"), F.col("s.band_key").alias("band_key")
    )


def minhash_band_keys_from_shingles(
    sh: Column, num_hashes: int = 8, rows_per_band: int = 4
) -> Column:
    """The doc's LSH band keys as a PER-ROW array<string> expression
    over an ALREADY-PROJECTED shingle-array column (element b+1 = band
    b's key), NULL for docs too short to shingle — bit-identical to the
    (band, band_key) rows :func:`minhash_band_keys` produces for the
    same text (property-pinned in tests/test_round14_minhash_stream.py).

    This exists for APPEND-MODE STREAMING (round 14): the relational
    path aggregates (groupBy min over exploded shingles), which
    Structured Streaming rejects in append mode, but each doc is one
    row, so the same minima fold per-row over the shingle ARRAY —
    ``min`` over a column of md5 hex strings == ``array_min`` over the
    same strings, and duplicates (relational path: distinct=False)
    cannot move a min.

    Take ``sh`` from a SEPARATE upstream projection of
    :func:`shingles` (as :func:`minhash_band_keys_expr` cannot): this
    expression references it num_hashes+1 times, HOFs are
    CodegenFallback with no common-subexpression elimination, and
    CollapseProject declines to inline non-cheap expressions into
    multiple uses — so the two-step form tokenizes each row ONCE where
    the inlined form re-shingles it 9x (measured 3.2x end-to-end on a
    20k-doc batch, round-14 review)."""
    assert num_hashes % rows_per_band == 0

    def _min_for_seed(i: int) -> Column:
        # arity-1 lambda on purpose: a two-parameter transform lambda
        # would receive (element, array_index) and shadow the seed
        seed = F.lit(f"{i}:")
        return F.array_min(F.transform(sh, lambda s: F.md5(F.concat(seed, s))))

    mins = [_min_for_seed(i) for i in range(num_hashes)]
    keys = F.array(
        *[
            F.concat_ws(
                ",", *mins[b * rows_per_band : (b + 1) * rows_per_band]
            )
            for b in range(num_hashes // rows_per_band)
        ]
    )
    return F.when(F.size(sh) > 0, keys)


def minhash_band_keys_expr(
    text: Column, num_hashes: int = 8, rows_per_band: int = 4
) -> Column:
    """:func:`minhash_band_keys_from_shingles` inlined over raw text —
    the one-expression convenience form. Prefer the two-step projection
    (see that docstring's re-evaluation note) anywhere the per-row cost
    matters; consumers here keep it for tests and ad-hoc use."""
    return minhash_band_keys_from_shingles(
        shingles(text), num_hashes, rows_per_band
    )


def lsh_bands(sig_df: DataFrame, id_col: str, rows_per_band: int = 4) -> DataFrame:
    """Collapse signatures into (doc, band, band_key) for bucket joins."""
    banded = sig_df.withColumn(
        "band", F.floor(F.col("seed") / rows_per_band).cast("int")
    )
    ordered = F.array_sort(F.collect_list(F.struct("seed", "minhash")))
    return banded.groupBy(id_col, "band").agg(
        F.array_join(
            F.transform(ordered, lambda s: s["minhash"]), ","
        ).alias("band_key")
    )


def lsh_candidate_pairs(
    bands_df: DataFrame, id_col: str, hot_bucket_cap: int | None = None
) -> DataFrame:
    """Distinct candidate pairs (a < b) sharing any band bucket.

    The self-join shuffles on (band, band_key) — the LSH bucket — so work
    is proportional to bucket sizes, never to n^2.

    ``hot_bucket_cap`` is the pair-contract twin of the aHash two-tier
    split (phash.pairs_from_band_table) for TEMPLATE-HEAVY corpora: a
    shared boilerplate prefix biases one band's minima, so a single
    (band, band_key) bucket holds B docs that are NOT near-dups overall
    — the plain join emits B^2/2 candidates and downstream verify kills
    ~all of them (the Zipf aHash twin measured 156 M candidates, 99 %
    verify-fail, from exactly this shape). With the cap set:

    - buckets <= cap: the plain bucket join, unchanged;
    - hot buckets: a member pair must ALSO agree on one of its OTHER
      band keys — the hot join adds (sub_band, sub_key) from each
      member's remaining bands to the key, so a biased bucket fragments
      into second-band sub-buckets and the quadratic term is removed
      rather than salted around.

    Semantics under the cap: unlike the aHash split there is no
    pigeonhole guarantee to hide behind — MinHash banding is already
    probabilistic, and demanding a second band inside hot buckets
    TIGHTENS the effective S-curve for those members only (a true
    near-dup pair at shingle-similarity s keeps probability
    1-(1-s^r)^(b-1) of a second-band match: ~1 for real dups, tiny for
    the template false-positives that made the bucket hot). EXACT
    duplicates agree on every band, so they are never lost. The DEFAULT
    (None) keeps the pair contract bit-exact for oracle replay; set the
    cap on crawl-scale corpora, where an uncapped hot bucket is a job
    killer, and document the recall trade with the run. Docs carrying a
    single band (num_hashes == rows_per_band) have no second band to
    agree on — the cap would drop all their hot pairs, so it is
    rejected.

    The band table is MATERIALIZED up front (optimization r15): every
    form of this operator references ``bands_df`` at least twice (the
    self-join sides; the capped form adds the multi-band probe, the
    hot-bucket aggregate, the tag join and the second-band expansion —
    8 planned copies of the shingle→minhash subtree, zero
    ReusedExchange, in the r15 before-plan), and AQE does not reuse
    those stages at runtime: measured at bench sf0.1, uncapped
    1.39 → 0.96 s and capped 2.84 → 1.34 s from this one barrier. The
    materialized relation is (id, band, band_key) — bands-per-doc rows
    of three scalars, tiny next to the corpus it indexes (the
    ahash_pairs precedent; reliable-storage checkpoint on a real
    cluster). Streaming inputs skip it (no checkpoints mid-stream) and
    keep the previous lineage shape.
    """
    if not bands_df.isStreaming:
        bands_df = bands_df.localCheckpoint(eager=True)
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    plain_on = [
        F.col("a.band") == F.col("b.band"),
        F.col("a.band_key") == F.col("b.band_key"),
        F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
    ]
    if hot_bucket_cap is None:
        return (
            a.join(b, on=plain_on)
            .select(
                F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
            )
            .distinct()
        )
    # bounded probe, not a corpus aggregate: banding emits every band
    # index for every doc, so one row with band >= 1 proves multi-band
    if bands_df.filter(F.col("band") >= 1).limit(1).count() == 0:
        raise ValueError(
            "hot_bucket_cap needs >= 2 bands per doc (a hot pair must be "
            "able to agree on a second band); got a single-band table"
        )
    hot = (
        bands_df.groupBy("band", "band_key")
        .agg(F.count(F.lit(1)).alias("__bn"))
        .filter(F.col("__bn") > hot_bucket_cap)
        .select("band", "band_key", F.lit(True).alias("__hot"))
    )
    tagged = bands_df.join(F.broadcast(hot), ["band", "band_key"], "left")
    normal = tagged.filter(F.col("__hot").isNull()).drop("__hot")
    na, nb = normal.alias("a"), normal.alias("b")
    cand_normal = na.join(nb, on=plain_on).select(
        F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
    )
    # hot tier: expand each hot-bucket member with its OTHER bands and
    # key the join on (bucket, second band) — the sub relation reuses
    # the same bands_df, so no new corpus pass
    subs = bands_df.select(
        F.col(id_col).alias("__sid"),
        F.col("band").alias("sub_band"),
        F.col("band_key").alias("sub_key"),
    )
    hot_rows = (
        tagged.filter(F.col("__hot"))
        .drop("__hot")
        .join(subs, on=[F.col(id_col) == F.col("__sid"), F.col("band") != F.col("sub_band")])
        .drop("__sid")
    )
    ha, hb = hot_rows.alias("a"), hot_rows.alias("b")
    cand_hot = ha.join(
        hb,
        on=plain_on
        + [
            F.col("a.sub_band") == F.col("b.sub_band"),
            F.col("a.sub_key") == F.col("b.sub_key"),
        ],
    ).select(
        F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
    )
    return cand_normal.unionByName(cand_hot).distinct()


def lsh_star_edges(bands_df: DataFrame, id_col: str) -> DataFrame:
    """Connectivity-preserving LSH edges: per (band, band_key) bucket the
    bucket's MIN id is the hub, and every other member gets exactly one
    (hub, member) edge — N-1 edges per bucket instead of the pair join's
    N(N-1)/2.

    For CLUSTER consumers (ensemble_dedup, dedup_clusters) this is an
    exact substitute for :func:`lsh_candidate_pairs`: the connected
    components are identical (a bucket's full pair clique and its hub
    star have the same transitive closure), and so are per-document
    incident signals (every bucket member touches a hub edge). What it
    removes is the quadratic term a crawl-scale EXACT-dup cluster
    creates — a million boilerplate copies share every band key, so the
    pair join would emit ~10^12 candidates per band while this emits
    10^6-1 edges; the aggregate below is map-side combinable on the
    same bucket-keyed shuffle the pair join already paid. Queries whose
    CONTRACT is the pair list keep the pair-complete form.

    The hub rides a bucket-partitioned WINDOW (the exact_star_edges
    shape) rather than a groupBy + join back: the join form referenced
    the un-materialized band pipeline twice, so the whole
    shingle→minhash subtree was planned AND executed once per side —
    measured 1.69 s vs 0.86 s for the band stage alone at bench sf0.1
    (optimization r15). Window partitions are LSH buckets — the same
    key and skew profile the join shuffled on."""
    w = Window.partitionBy("band", "band_key")
    return (
        bands_df.withColumn("__hub", F.min(id_col).over(w))
        .filter(F.col(id_col) != F.col("__hub"))
        .select(
            F.col("__hub").alias("doc_a"), F.col(id_col).alias("doc_b")
        )
        .distinct()
    )


def ngram_jaccard_pairs(
    shingle_df: DataFrame,
    id_col: str,
    min_shared: int = 2,
    min_jaccard_bp: int = 500,
) -> DataFrame:
    """Exact n-gram Jaccard over candidate pairs found by shared shingles.

    Inverted-index join (shingle -> docs) keeps this linear in the number
    of co-occurrences; jaccard is reported in floor'd basis points.
    """
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = shingle_df.alias("a")
    b = shingle_df.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        F.lit(10000.0)
        * F.col("shared").cast("double")
        / (
            F.col("sa.sz").cast("double")
            + F.col("sb.sz").cast("double")
            - F.col("shared").cast("double")
        )
    )
    return (
        inter.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            F.col("shared").cast("bigint").alias("shared"),
            F.floor(jac).cast("bigint").alias("jaccard_bp"),
        )
        .filter(F.col("jaccard_bp") >= min_jaccard_bp)
    )


SIMHASH_WORDS = 4  # 4 x 16-bit words = one 64-bit signature


def doc_simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, w0..w3): 64-bit SimHash via relational bit votes — the scale
    form.

    Word j of the signature takes its 16 bit projections from md5 hex
    chars [4j+1, 4j+4] of each token. explode -> a single doc-keyed
    groupBy holding 64 conditional-sum aggregates -> per-word bit pack.
    Fully whole-stage-codegen (the ``simhash16`` column form runs votes
    as interpreted array lambdas), one shuffle — and that exchange is
    REUSED by Spark when the result self-joins (simhash_near_pairs).

    The four-word representation (instead of one packed BIGINT) is
    deliberate: bit 63 of a packed long is the sign bit and ANSI-mode
    arithmetic on 2^63-scale literals overflows, while the words are
    exactly the 4x16-bit LSH band keys downstream — no unpacking join."""
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    )
    # Each token occurrence votes +/-1 per bit, so votes are equivalently
    # sum(+/-count) over DISTINCT (doc, token) pairs — pre-aggregate the
    # counts first. Token frequency is Zipfian: this cuts the md5 work
    # and the 64-sum aggregation rows by the repetition factor (map-side
    # combine makes both shuffles tiny), instead of hashing every
    # occurrence. The word values are projected BEFORE the vote sums —
    # an md5 embedded in every aggregate expression would be evaluated
    # 16x per word per row.
    tokc = tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("__n"))
    hashed = tokc.select(F.col(id_col), F.col("__n"), F.md5(F.col("tok")).alias("__h"))
    # The 64 vote aggregates and the 4 bit-packers are built as SQL
    # expression STRINGS, not composed Column objects: each F.col/F.when
    # node is a py4j round-trip, and at this width the Column form spends
    # ~2s per plan just constructing the query in Python — more than the
    # query takes to run at sf0.1. One parsed expr per output column
    # keeps plan-build O(columns) instead of O(AST nodes).
    tb = hashed.selectExpr(
        id_col,
        "__n",
        *[
            f"CAST(conv(substring(__h, {4 * j + 1}, 4), 16, 10) AS INT) AS __tb{j}"
            for j in range(SIMHASH_WORDS)
        ],
    )
    votes = tb.groupBy(id_col).agg(
        *[
            F.expr(f"sum(IF((__tb{j} & {1 << b}) != 0, __n, -__n)) AS __v{j}_{b}")
            for j in range(SIMHASH_WORDS)
            for b in range(16)
        ]
    )
    word_exprs = [
        " + ".join(f"IF(__v{j}_{b} > 0, {1 << b}, 0)" for b in range(16))
        for j in range(SIMHASH_WORDS)
    ]
    return votes.selectExpr(
        id_col, *[f"CAST({e} AS INT) AS w{j}" for j, e in enumerate(word_exprs)]
    )


def simhash16(text: Column) -> Column:
    """16-bit SimHash over whitespace tokens, md5-derived bit projections.

    VERIFICATION-ONLY column form (equals word 0 of ``doc_simhash``): the
    array-lambda votes run interpreted and recompute per consumer, and 16
    bits cannot separate a large corpus — the scale path is
    ``doc_simhash`` + ``simhash_near_pairs``.

    Per token: the first 4 md5 hex chars give 16 bits; each bit votes
    +1/-1; the sign of each bit's total sets the output bit. Exact integer
    arithmetic — portable across engines.
    """
    toks = tokens(text)
    tok_bits = F.transform(
        toks, lambda x: F.conv(F.substring(F.md5(x), 1, 4), 16, 10).cast("int")
    )
    result = F.lit(0)
    for bit in range(16):
        votes = F.aggregate(
            tok_bits,
            F.lit(0),
            lambda acc, v: acc
            + F.when(v.bitwiseAND(F.lit(1 << bit)) != 0, F.lit(1)).otherwise(
                F.lit(-1)
            ),
        )
        result = result + F.when(votes > 0, F.lit(1 << bit)).otherwise(F.lit(0))
    return result.cast("int")


def simhash_near_pairs(
    sim_df: DataFrame, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash: candidates share at least one of
    the four 16-bit signature words, then exact Hamming verify.

    Pigeonhole: a pair within Hamming distance <= 3 differs in at most 3
    of the 64 bits, which can corrupt at most 3 of the 4 words — at least
    one word matches exactly, so RECALL IS EXACT at the default
    threshold. Each band's equi-join shuffles on (seg, word value):
    65,536 buckets per band, and identical words on unrelated docs are
    p=2^-16 collisions — bucket sizes stay bounded at corpus scale,
    never O(n^2). (The round-1 8-bit halves gave only 256 buckets.)

    Pairs matching in several bands are emitted ONCE, from their first
    matching band: each side carries all four words, so "some earlier
    band j < seg also matches" is a post-join column predicate — a free
    codegen filter replacing the candidate-wide ``distinct()`` exchange
    (at corpus scale the candidate set is the largest intermediate in
    the query; not shuffling it again matters more than anything here).

    Returns (id_a, id_b, hamming).

    NOT checkpointed (optimization r15, measured): the self-join's two
    sides share the IDENTICAL signature subtree and AQE reuses the
    exchange at runtime (the
    ``test_simhash_candidate_join_reuses_signature_exchange`` contract)
    — an explicit barrier was A/B-flat on the bench key (1.54 → 1.48 s,
    inside noise) and would trade a working ReusedExchange for an
    executor-storage dependency. Contrast ``lsh_candidate_pairs``,
    whose tiered references are NON-identical subtrees that AQE cannot
    reuse — there the barrier wins 2.8 → 1.3 s.
    """
    words = [f"w{j}" for j in range(SIMHASH_WORDS)]
    segs = sim_df.select(
        F.col(id_col),
        *[F.col(w) for w in words],
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("seg"), F.col(words[j]).alias("key"))
                    for j in range(SIMHASH_WORDS)
                ]
            )
        ).alias("s"),
    ).select(
        F.col(id_col),
        *[F.col(w) for w in words],
        F.col("s.seg").alias("seg"),
        F.col("s.key").alias("key"),
    )
    a, b = segs.alias("a"), segs.alias("b")
    hamming = None
    for w in words:
        term = F.bit_count(F.col(f"a.{w}").bitwiseXOR(F.col(f"b.{w}")))
        hamming = term if hamming is None else hamming + term
    earlier_band = None
    for j in range(SIMHASH_WORDS):
        c = (F.col("a.seg") > F.lit(j)) & (
            F.col(f"a.w{j}") == F.col(f"b.w{j}")
        )
        earlier_band = c if earlier_band is None else earlier_band | c
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.seg") == F.col("b.seg"),
                F.col("a.key") == F.col("b.key"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .filter(~earlier_band)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.cast("int").alias("hamming"),
        )
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def ngram_jaccard_pairs_capped(
    shingle_df: DataFrame,
    id_col: str,
    df_cap: int = 50,
    min_shared: int = 2,
    min_jaccard_bp: int = 500,
) -> DataFrame:
    """DF-capped Jaccard: shingles appearing in more than ``df_cap`` docs
    are dropped from CANDIDATE GENERATION (they are stop-phrases that
    contribute quadratic pair rows and near-zero identity signal), while
    per-doc sizes and the similarity denominator still use the FULL
    shingle sets — so reported Jaccard values are exact for every pair
    that survives; only pairs whose overlap is entirely stop-phrases are
    missed.

    This is the 100 TB-safe form: shingle frequency is Zipfian, and an
    uncapped inverted index turns the most common shingle's f docs into
    f^2 join rows on one reducer. The cap bounds every bucket.

    The DF filter is a count over a shingle-partitioned window (not a
    groupBy + semi-join): the window's exchange IS the partitioning the
    candidate self-join needs, so the filtered index is shuffled once
    and reused by both join sides — the semi-join form re-derived the
    shingle set three times.
    """
    sizes = shingle_df.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    w_df = Window.partitionBy("shingle")
    indexed = (
        shingle_df.withColumn("__df", F.count(F.lit(1)).over(w_df))
        .filter(F.col("__df") <= df_cap)
        .drop("__df")
    )
    a = indexed.alias("a")
    b = indexed.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = (
        F.lit(10000.0)
        * F.col("shared").cast("double")
        / (
            F.col("sa.sz").cast("double")
            + F.col("sb.sz").cast("double")
            - F.col("shared").cast("double")
        )
    )
    return (
        inter.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
        .select(
            "doc_a",
            "doc_b",
            F.col("shared").cast("bigint").alias("shared"),
            F.floor(jac).cast("bigint").alias("jaccard_bp"),
        )
        .filter(F.col("jaccard_bp") >= min_jaccard_bp)
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., MOSS): hash every k-gram,
    slide a w-hash window over the sequence, keep each window's minimum —
    the fingerprint set that guarantees any shared run of w+k-1 tokens
    between two documents shares at least one fingerprint, at ~2/(w+1)
    the density of full shingling.

    Fully relational: the positional k-gram hashes come from the same
    posexplode + window-lead shape as doc_shingles, the rolling minimum
    is a rows-frame window min, and the fingerprint set is a distinct —
    one doc-keyed shuffle total, per-doc work linear in tokens. md5 (not
    engine-native hash) keeps the selected minima identical on any
    engine, so the fingerprint SET is portable, not just same-sized.

    Output: (id_col, fingerprint) distinct pairs.
    """
    tok = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias("pos", "tok"),
    )
    w_lead = Window.partitionBy(id_col).orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w_lead) for j in range(1, k)]
    grams = tok.select(
        F.col(id_col),
        F.col("pos"),
        F.when(
            F.lead("tok", k - 1).over(w_lead).isNotNull(),
            F.md5(F.concat_ws(" ", *parts)),
        ).alias("h"),
    ).filter(F.col("h").isNotNull())
    w_roll = (
        Window.partitionBy(id_col).orderBy("pos").rowsBetween(0, w - 1)
    )
    rolled = grams.select(
        F.col(id_col),
        F.min("h").over(w_roll).alias("fingerprint"),
        F.count(F.lit(1)).over(w_roll).alias("__n"),
    ).filter(F.col("__n") == w)
    return rolled.select(id_col, "fingerprint").distinct()


def signature_agreement(
    shingle_df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Estimated Jaccard per candidate pair from MinHash signature
    agreement: est = (matching seeds) / num_hashes, reported as
    floor-scaled basis points alongside the raw match count.

    The estimator-quality query every corpus dedup pipeline should ship:
    E[matches/k] IS the true Jaccard, so comparing ``est_bp`` against the
    exact shingle Jaccard (q_ngram_jaccard) measures how trustworthy the
    sketch parameters are before committing a 100 TB run to them.

    Plan shape: the wide signature table (one row per doc, k columns)
    joins the pair list twice by doc id — broadcast-sized pair lists stay
    map-side; the match count is a k-term integer sum, no explode.
    Returns (doc_a, doc_b, sig_matches, est_bp).
    """
    wide = _wide_minhash(shingle_df, id_col, num_hashes)
    a = wide.select(
        F.col(id_col).alias("__ida"),
        *[F.col(f"__h{i}").alias(f"__a{i}") for i in range(num_hashes)],
    )
    b = wide.select(
        F.col(id_col).alias("__idb"),
        *[F.col(f"__h{i}").alias(f"__b{i}") for i in range(num_hashes)],
    )
    matches = " + ".join(
        f"IF(__a{i} = __b{i}, 1, 0)" for i in range(num_hashes)
    )
    return (
        pairs.join(a, pairs[id_a] == a["__ida"])
        .join(b, pairs[id_b] == b["__idb"])
        .selectExpr(
            f"{id_a}",
            f"{id_b}",
            f"CAST({matches} AS BIGINT) AS sig_matches",
            f"CAST(FLOOR(CAST(10000 AS DOUBLE) * ({matches}) / {num_hashes}) AS BIGINT) AS est_bp",
        )
    )


def containment_pairs(
    index_df: DataFrame,
    sizes_df: DataFrame,
    id_col: str,
    min_shared: int = 2,
    min_containment_bp: int = 5000,
) -> DataFrame:
    """Directed near-CONTAINMENT pairs: (doc_a, doc_b, shared,
    containment_bp) where containment_bp = floor(10000 * |A∩B| / |A|) —
    the asymmetric complement to Jaccard. Symmetric Jaccard misses the
    subset case entirely (a document wholly embedded in a much larger
    one scores |A|/|B| ≈ 0), yet training-data dedup cares about exactly
    that: quoted articles, concatenated dumps, boilerplate-wrapped
    reposts.

    ``index_df`` is the (id, shingle) candidate index — pass the
    DF-capped rare-shingle relation at scale (the same Zipf-head cap as
    ``q_ngram_jaccard_capped``; the intersection count is then a lower
    bound and the reported containment conservative). ``sizes_df`` is
    (id, sz) over the FULL shingle set, so the denominator is the true
    set size. Both directions are emitted (a-in-b and b-in-a are
    different claims). The basis-point floor divides integers bounded
    far below 2^53 — provably exact on both engines (see SCALING.md,
    bounded-numerator rule)."""
    a = index_df.alias("a")
    b = index_df.alias("b")
    inter = (
        a.join(
            b,
            on=[
                F.col("a.shingle") == F.col("b.shingle"),
                F.col(f"a.{id_col}") != F.col(f"b.{id_col}"),
            ],
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
    sz_a = sizes_df.select(
        F.col(id_col).alias("doc_a"), F.col("sz").alias("__sza")
    )
    cont = F.floor(
        (F.lit(10000).cast("double") * F.col("shared")) / F.col("__sza")
    ).cast("bigint")
    return (
        inter.join(sz_a, "doc_a")
        .select(
            "doc_a",
            "doc_b",
            F.col("shared").cast("bigint").alias("shared"),
            cont.alias("containment_bp"),
        )
        .filter(F.col("containment_bp") >= min_containment_bp)
    )


#: metadata columns a materialized band index carries so consumers can
#: verify the banding it was built with (ADVICE r13): band keys from a
#: different (num_hashes, rows_per_band) never equi-join the delta's,
#: so an unchecked mismatch silently returns kept=1 for every doc.
BAND_INDEX_META_COLS = ("idx_num_hashes", "idx_rows_per_band")


def _check_band_index_params(
    base_index: DataFrame, num_hashes: int, rows_per_band: int
) -> None:
    """Fail LOUDLY when a materialized index's recorded banding differs
    from the call's. A bare :func:`minhash_band_keys` relation (no meta
    columns) stays trusted — ownership is then the caller's tag, the
    pre-r14 contract. The check is one bounded action (a DISTINCT over
    two constant columns — map-side combine collapses it to one row per
    partition before the shuffle), paid once per screen construction.

    DISTINCT rather than a first-row peek (ADVICE r14): an index
    accidentally assembled from MIXED bandings (e.g. a union of two
    epoch artifacts) would pass a first-row check while half its band
    keys never join — here it raises."""
    if not set(BAND_INDEX_META_COLS) <= set(base_index.columns):
        return
    rows = (
        base_index.select(*BAND_INDEX_META_COLS).distinct().limit(3).collect()
    )
    if not rows:
        return
    if len(rows) > 1:
        raise ValueError(
            "base_index carries more than one (num_hashes, rows_per_band) "
            f"combination {sorted((r[0], r[1]) for r in rows)} — it was "
            "assembled from mixed bandings (e.g. a union of two epoch "
            "artifacts); band keys from different bandings never equi-join, "
            "so part of the index would silently never match. Re-materialize "
            "one consistent epoch index."
        )
    got_h, got_r = rows[0][0], rows[0][1]
    if (got_h, got_r) != (num_hashes, rows_per_band):
        raise ValueError(
            f"base_index was materialized with num_hashes={got_h}, "
            f"rows_per_band={got_r} but this screen runs num_hashes="
            f"{num_hashes}, rows_per_band={rows_per_band} — mismatched "
            "bandings never share band keys, so the screen would "
            "silently keep every delta doc; re-materialize the epoch "
            "index with the call's banding (or match the call to it)"
        )


def incremental_lsh_dedup(
    base: DataFrame,
    delta: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_jaccard_bp: int = 2000,
    num_hashes: int = 8,
    rows_per_band: int = 4,
    base_index: DataFrame | None = None,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Incremental corpus update: near-dup-screen a DELTA batch against an
    already-deduped BASE corpus without re-pairing the base against
    itself.

    ``candidates`` (round 15): an already-computed (delta_id, base_id)
    candidate frontier — e.g. the drained output of
    :func:`streaming.neardup_screen_stream.streaming_minhash_candidate_screen`
    — in which case the band join is skipped entirely and ONLY those
    pairs are exact-verified. This is the streamed-screen/batch-verify
    composition the streaming module documents: candidates surface live
    as documents arrive, the bounded Jaccard verify runs at batch
    cadence over the drained frontier, and the result equals the
    all-batch operator's because the streamed candidate set equals the
    band join's (tests/test_round15_stream_compose.py pins end-to-end
    equality). Delta docs with no candidate row still report kept=1.

    This is the shape a 100 TB corpus actually runs dedup in: the base's
    (doc, band, band_key) index is computed ONCE PER EPOCH and passed as
    ``base_index`` (the relation :func:`minhash_band_keys` produces —
    e.g. read back from the parquet :func:`materialize_epoch_band_index`
    wrote; without it the index is derived from ``base`` inline, the
    one-shot/test path that re-minhashes the whole corpus per batch).
    Each incoming batch then only (1) minhashes ITSELF, (2) equi-joins
    its band keys against the index (bucket join — work proportional to
    matched buckets, never |base|×|delta|), (3) exact-verifies the
    candidates by n-gram Jaccard. The base-side self-pairing cost of
    q_minhash_lsh_pairs is paid zero times here.

    ``base`` is still required WITH ``base_index``: the verify stage
    needs candidate base docs' text. That read is pruned to the
    CANDIDATE FRONTIER (the checkpointed candidate pairs semi-join the
    base scan before shingling — round 13), so per batch the base-side
    verify cost is |matched docs|, not |base|: previously the whole
    base corpus was re-shingled and shuffled into the intersection join
    every batch, a full-corpus explode that dwarfed the band index this
    operator already avoided recomputing.

    Returns one row per delta doc: (id, kept, dup_of, jaccard_bp) with
    kept=0 when a base doc verifies at >= ``min_jaccard_bp`` (dup_of = the
    best-matching base doc, jaccard descending / id ascending), else
    kept=1 with NULL dup_of. Delta-internal duplicates are left to the
    ordinary within-batch pass (lsh_candidate_pairs on the delta alone);
    this operator owns only the delta-vs-base frontier.
    """
    if base is None:
        # unlike phash.ahash_incremental (where the index alone
        # suffices), the verify stage here reads candidate base docs'
        # TEXT — fail at entry, not as an opaque AttributeError deep in
        # the semi-join
        raise ValueError(
            "base is required even with base_index=: the Jaccard verify "
            "stage shingles the candidate base docs' text (the index "
            "carries band keys only)"
        )
    if candidates is not None:
        missing = {"delta_id", "base_id"} - set(candidates.columns)
        if missing:
            raise ValueError(
                f"candidates lacks the screen contract columns "
                f"{sorted(missing)}; got {candidates.columns}"
            )
        cand = (
            candidates.select("delta_id", "base_id")
            .distinct()
            .localCheckpoint(eager=True)
        )
    else:
        if base_index is not None:
            missing = {id_col, "band", "band_key"} - set(base_index.columns)
            if missing:
                raise ValueError(
                    f"base_index lacks the minhash_band_keys contract "
                    f"columns {sorted(missing)}; got {base_index.columns}"
                )
            _check_band_index_params(base_index, num_hashes, rows_per_band)
            base_bands = base_index.select(id_col, "band", "band_key")
        else:
            base_bands = minhash_band_keys(
                doc_shingles(base, id_col, text_col, distinct=False),
                id_col, num_hashes, rows_per_band,
            )
        delta_bands = minhash_band_keys(
            doc_shingles(delta, id_col, text_col, distinct=False),
            id_col, num_hashes, rows_per_band,
        )
        cand = (
            delta_bands.alias("d")
            .join(base_bands.alias("b"), on=["band", "band_key"])
            .select(
                F.col(f"d.{id_col}").alias("delta_id"),
                F.col(f"b.{id_col}").alias("base_id"),
            )
            .distinct()
            # the candidate frontier is delta-bounded (tiny next to
            # either corpus) and consumed twice — once to prune the base
            # verify scan, once as the intersection join's spine.
            # Materialize it so the band join runs once and the prune is
            # a broadcastable static relation.
            .localCheckpoint(eager=True)
        )
    sh_d = doc_shingles(delta, id_col, text_col, distinct=True)
    base_cand = base.join(
        cand.select(F.col("base_id").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    sh_b = doc_shingles(base_cand, id_col, text_col, distinct=True)
    sz_d = sh_d.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("sz_d"))
    sz_b = sh_b.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("sz_b"))
    inter = (
        cand.join(sh_d.alias("sa"), F.col("delta_id") == F.col(f"sa.{id_col}"))
        .join(
            sh_b.alias("sb"),
            (F.col("base_id") == F.col(f"sb.{id_col}"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("delta_id", "base_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter"))
    )
    jac = (
        F.lit(10000.0)
        * F.col("inter").cast("double")
        / (
            F.col("sz_d").cast("double")
            + F.col("sz_b").cast("double")
            - F.col("inter").cast("double")
        )
    )
    verified = (
        inter.join(sz_d, F.col("delta_id") == F.col(f"{id_col}")).drop(id_col)
        .join(sz_b, F.col("base_id") == F.col(f"{id_col}")).drop(id_col)
        .select(
            "delta_id",
            "base_id",
            F.floor(jac).cast("bigint").alias("jaccard_bp"),
        )
        .filter(F.col("jaccard_bp") >= min_jaccard_bp)
    )
    w = Window.partitionBy("delta_id").orderBy(
        F.col("jaccard_bp").desc(), F.col("base_id").asc()
    )
    best = (
        verified.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("delta_id", "base_id", "jaccard_bp")
    )
    return (
        delta.select(id_col)
        .join(best, F.col(id_col) == F.col("delta_id"), "left")
        .select(
            id_col,
            F.when(F.col("base_id").isNull(), 1).otherwise(0)
            .cast("int")
            .alias("kept"),
            F.col("base_id").alias("dup_of"),
            "jaccard_bp",
        )
    )


def materialize_epoch_band_index(
    docs: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 4,
) -> None:
    """Write ``docs``'s MinHash band index — the (id, band, band_key)
    relation :func:`minhash_band_keys` produces — as parquet at
    ``path``: the once-per-epoch job whose output
    :func:`incremental_lsh_dedup` consumes as ``base_index`` on every
    delta batch (the aHash twin is phash.materialize_epoch_index;
    VERDICT r12 item 2 generalized). The index is bands-per-doc rows of
    (id, small int, short digest string) — a fraction of a percent of
    the corpus it indexes — and a pure function of the corpus, so
    re-materializing after corpus changes yields the identical relation
    and oracles that recompute it from raw text still value-match.

    The banding parameters travel WITH the artifact as constant columns
    (:data:`BAND_INDEX_META_COLS`, ADVICE r13) so
    :func:`incremental_lsh_dedup` can reject an index whose banding
    does not match the screen's instead of silently never joining.
    (The aHash twin needs no equivalent: its band count is the module
    constant phash.N_BANDS, structurally pinned by the __bands array
    the schema check already sees — there is no per-call banding to
    desync.)"""
    keys = minhash_band_keys(
        doc_shingles(docs, id_col, text_col, distinct=False),
        id_col,
        num_hashes,
        rows_per_band,
    )
    keys.select(
        "*",
        F.lit(num_hashes).cast("int").alias("idx_num_hashes"),
        F.lit(rows_per_band).cast("int").alias("idx_rows_per_band"),
    ).write.mode("overwrite").parquet(path)


def _wide_oph(shingle_df: DataFrame, id_col: str, num_bins: int) -> DataFrame:
    """One row per doc with columns ``__d0..__d{k-1}``: the DENSIFIED
    one-permutation-hashing sketch (Li, Owen & Zhang 2012; Shrivastava &
    Li 2014 rotation densification).

    Why it exists next to ``_wide_minhash``: the k-permutation path
    computes k md5 digests PER SHINGLE ROW — at 100 TB the signature
    scan is k x the corpus's hash throughput. OPH computes ONE digest
    per shingle, buckets it into k bins by its hash value, takes the
    per-bin minimum in the same single doc-keyed groupBy, and fills
    empty bins by borrowing the nearest non-empty bin to the RIGHT
    (circular) — the unbiased densification that keeps banding/LSH
    collision semantics. Same shuffle shape, 1/k the CPU.

    Exactness: bin = bigint of the digest's first 12 hex chars mod k,
    min is over hex strings (order-free), the borrow is a k-arm
    coalesce — every step replays in SQL, so OPH sketches are
    oracle-checkable like the k-permutation ones."""
    h = F.md5(F.col("shingle"))
    bin_col = F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint") % num_bins
    mins = shingle_df.select(
        F.col(id_col), h.alias("__h"), bin_col.alias("__bin")
    ).groupBy(id_col).agg(
        *[
            F.min(F.when(F.col("__bin") == i, F.col("__h"))).alias(f"__m{i}")
            for i in range(num_bins)
        ]
    )
    dense = [
        F.coalesce(
            *[F.col(f"__m{(i + j) % num_bins}") for j in range(num_bins)]
        ).alias(f"__d{i}")
        for i in range(num_bins)
    ]
    return mins.select(F.col(id_col), *dense)


def oph_signatures(
    shingle_df: DataFrame, id_col: str, num_bins: int = 8
) -> DataFrame:
    """(doc, seed, minhash) rows from the densified OPH sketch — the
    drop-in signature relation for LSH banding at 1/k the hashing CPU
    of ``minhash_signatures``. ``seed`` is the bin index."""
    wide = _wide_oph(shingle_df, id_col, num_bins)
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("seed"), F.col(f"__d{i}").alias("minhash"))
            for i in range(num_bins)
        ]
    )
    return wide.select(F.col(id_col), F.explode(pairs).alias("s")).select(
        F.col(id_col),
        F.col("s.seed").alias("seed"),
        F.col("s.minhash").alias("minhash"),
    )


def oph_band_keys(
    shingle_df: DataFrame,
    id_col: str,
    num_bins: int = 8,
    rows_per_band: int = 4,
) -> DataFrame:
    """(doc, band, band_key) straight from the OPH sketch — the fused
    one-shuffle path to LSH buckets (``minhash_band_keys`` shape) at
    1/k the signature CPU."""
    assert num_bins % rows_per_band == 0
    wide = _wide_oph(shingle_df, id_col, num_bins)
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"__d{b * rows_per_band + j}")
                        for j in range(rows_per_band)
                    ],
                ).alias("band_key"),
            )
            for b in range(num_bins // rows_per_band)
        ]
    )
    return wide.select(F.col(id_col), F.explode(bands).alias("s")).select(
        F.col(id_col),
        F.col("s.band").alias("band"),
        F.col("s.band_key").alias("band_key"),
    )


def oph_bands_expr(
    text_col,
    num_bins: int = 8,
    rows_per_band: int = 4,
    shingle_n: int = 3,
):
    """The densified OPH band keys as a single ROW-LOCAL column
    expression: array<struct<band int, band_key string>>, NULL when the
    text has fewer than ``shingle_n`` words.

    Why a second construction: ``oph_band_keys`` aggregates a shingle
    relation (one doc-keyed shuffle) — right for batch. A STREAMING
    near-dup operator needs the sketch with no shuffle and no state, so
    this builds the identical bands from higher-order functions only
    (split -> shingle transform -> md5 -> per-bin array_min -> rotation
    coalesce): pure whole-stage-codegen projection, legal in any
    streaming stage. Equality with the batch path is pinned by
    tests/test_oph.py::test_bands_expr_matches_batch_path."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    words = F.split(F.lower(text_col), " ")
    n_sh = F.greatest(F.size(words) - (shingle_n - 1), F.lit(0))
    shingles = F.transform(
        F.sequence(F.lit(1), n_sh),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, i + j) for j in range(shingle_n)]
        ),
    )
    hs = F.transform(shingles, lambda s: F.md5(s))
    mins = F.transform(
        F.sequence(F.lit(0), F.lit(num_bins - 1)),
        lambda b: F.array_min(
            F.filter(
                hs,
                lambda h: F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")
                % num_bins
                == b.cast("bigint"),
            )
        ),
    )
    def _dense(i: int) -> Column:
        return F.coalesce(
            *[F.element_at(mins, ((i + j) % num_bins) + 1) for j in range(num_bins)]
        )

    bands = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                F.concat_ws(
                    ",",
                    *[_dense(b * rows_per_band + j) for j in range(rows_per_band)],
                ).alias("band_key"),
            )
            for b in range(num_bins // rows_per_band)
        ]
    )
    return F.when(n_sh > 0, bands)


LSH_CONFIGS = ((1, 8), (2, 4), (4, 2), (8, 1), (1, 16), (2, 8), (4, 4), (8, 2), (16, 1))


def lsh_p_expr(r: int, b: int, div_op: str, bucket_col: str = "s_tenths") -> str:
    """Exact-integer banding S-curve at similarity s = bucket/10:
    P(collide) = 1 - (1 - s^r)^b, scaled e6 and floored. With s = i/10
    the whole expression is bigint: 1e6 - ceil((10^r - i^r)^b / D) with
    D = 10^(r*b - 6), the ceiling written as (X + D - 1) DIV D so the
    complement is a true FLOOR of the probability — powers unroll to
    literal multiplication chains (r*b <= 16 keeps every intermediate
    under 10^16), and the only division is exact integer division, so
    ANY engine reproduces the same integers. ``div_op`` is the engine's
    integer-division token ('DIV' for Spark SQL, '//' for DuckDB)."""
    assert r * b in (8, 16), "hash budget must keep 10^(r*b) in bigint"
    i = f"CAST({bucket_col} AS BIGINT)"
    i_pow_r = " * ".join([i] * r)
    one_minus = f"({10 ** r} - {i_pow_r})"
    x = " * ".join([one_minus] * b)
    d = 10 ** (r * b - 6)
    return f"(1000000 - (({x}) + {d - 1}) {div_op} {d})"


def lsh_recall_audit(
    pairs: DataFrame, jaccard_bp_col: str = "jaccard_bp"
) -> DataFrame:
    """LSH banding design audit: for every (rows_per_band, bands) config
    in the 8- and 16-hash budgets, the exact collision probability at
    each observed similarity decile of THIS corpus's near-dup pairs,
    plus the config's expected recall over that distribution — the
    table you read before choosing banding parameters, computed from
    the data rather than an assumed similarity mix.

    Output: (rows_per_band, bands, s_tenths, n_pairs, p_e6,
    config_recall_e6); recall_e6 = floor(sum(n*P)/sum(n)) per config.
    The pair histogram is a tiny aggregate of the (already bounded)
    verified-pair relation; the config cross is 9 literal rows."""
    hist = (
        pairs.selectExpr(
            f"LEAST(CAST({jaccard_bp_col} AS BIGINT) DIV 1000, 10) AS s_tenths"
        )
        .groupBy("s_tenths")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    # one config-EXPLODE + CASE, not a 9-way union: a union would plan
    # the pair-generation subtree once per branch (the shingle self-join
    # nine times over); the explode keeps ONE subtree and the 9
    # probability expressions dispatch per row
    cfgs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).cast("int").alias("rows_per_band"),
                    F.lit(b).cast("int").alias("bands"),
                )
                for r, b in LSH_CONFIGS
            ]
        )
    )
    p_case = (
        "CASE "
        + " ".join(
            f"WHEN rows_per_band = {r} AND bands = {b} "
            f"THEN CAST({lsh_p_expr(r, b, 'DIV')} AS BIGINT)"
            for r, b in LSH_CONFIGS
        )
        + " END"
    )
    detail = (
        hist.select("s_tenths", "n_pairs", cfgs.alias("__c"))
        .select("s_tenths", "n_pairs", "__c.rows_per_band", "__c.bands")
        .selectExpr(
            "rows_per_band",
            "bands",
            "CAST(s_tenths AS INT) AS s_tenths",
            "n_pairs",
            f"{p_case} AS p_e6",
        )
    )
    return detail.withColumn(
        "config_recall_e6",
        F.expr(
            "CAST(SUM(n_pairs * p_e6) OVER "
            "(PARTITION BY rows_per_band, bands) DIV "
            "SUM(n_pairs) OVER (PARTITION BY rows_per_band, bands) AS BIGINT)"
        ),
    )
