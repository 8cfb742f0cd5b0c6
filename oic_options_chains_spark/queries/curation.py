"""Dataset-curation t2 queries (round 3): distinct-count sketching,
hard-negative mining, quality-aware dedup close-out, sketch-quality
measurement, source-priority dedup, vocabulary/OOV prep, and dataset
manifests — the governance and QA layer over the corpus operators.

Same cross-engine rules as the rest of queries/: md5 for all hashing,
integer or exact-power-of-two math in every hashed output, no log/ln
inside either engine (the HLL small-range table is precomputed into both
plans), no DecimalType in any final schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.minhash import (
    doc_shingles,
    lsh_candidate_pairs,
    minhash_band_keys,
    signature_agreement,
)
from oic_options_chains_spark.operators.sketches import (
    hll_distinct_estimate,
    hll_linear_table,
    hll_numerator,
)
from oic_options_chains_spark.queries.extensions import _SIG_SQL
from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table

# floor(alpha_256 * 256^2 * 2^53) — ONE exact integer literal shared
# with the Spark plan (operators/sketches.hll_numerator); the raw
# estimate is a pure HUGEINT integer division, float-free on both sides.
_HLL_NUM_256 = hll_numerator(256)
_HLL_TABLE_256 = ", ".join(str(x) for x in hll_linear_table(256))

# The recursive-CTE component fixpoint over LSH candidate pairs, shared
# by the cluster queries here (same construction as q_dedup_clusters).
_CC_SQL = (
    "WITH RECURSIVE "
    + _SIG_SQL.removeprefix("WITH ")
    + """,
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INT) AS band,
             string_agg(minhash, ',' ORDER BY seed) AS band_key
      FROM sig GROUP BY doc_id, seed // 4),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(src, dst) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    cc AS (SELECT src AS doc_id, MIN(dst) AS cluster_id
           FROM reach GROUP BY src)
"""
)


@register(
    "q_hll_distinct",
    oracle=f"""
    WITH h AS (SELECT md5(CAST(user_id AS VARCHAR)) AS h
               FROM events GROUP BY 1),
    r AS (SELECT CAST(concat('0x', substring(h, 1, 2)) AS INT) AS reg,
                 CAST(concat('0x', substring(h, 3, 13)) AS BIGINT) AS v
          FROM h),
    m AS (SELECT reg, MAX(IF(v = 0, 53, 53 - length(bin(v)))) AS rho
          FROM r GROUP BY reg),
    s AS (SELECT COUNT(*) AS n_regs,
                 COALESCE(SUM((CAST(1 AS BIGINT) << (53 - rho))),
                          CAST(0 AS BIGINT)) AS t
          FROM m),
    e AS (SELECT CAST(256 AS BIGINT) AS m,
                 CAST(256 - n_regs AS BIGINT) AS n_zero_regs,
                 -- Output-type contract: the driver hashes via pandas, where
                 -- DuckDB HUGEINT degrades to float64 and values > 2^53 drift.
                 -- Max is m*2^53 = 2^61, so BIGINT is exact and required here.
                 CAST(t + (CAST(1 AS BIGINT) << 53) * (256 - n_regs)
                      AS BIGINT) AS sum_scaled,
                 CAST(CAST('{_HLL_NUM_256}' AS HUGEINT)
                      // CAST(t + (CAST(1 AS BIGINT) << 53) * (256 - n_regs)
                              AS HUGEINT) AS BIGINT) AS raw_est
          FROM s)
    SELECT m, n_zero_regs, sum_scaled, raw_est,
           CAST(IF(raw_est <= 640 AND n_zero_regs > 0,
                   ([{_HLL_TABLE_256}])[CAST(n_zero_regs AS INT)],
                   raw_est) AS BIGINT) AS estimate
    FROM e
    """,
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog (b=8) over the event-stream user ids:
    md5 registers, integer rank math, scaled-integer harmonic sum, and a
    precomputed small-range table — bit-identical on any engine, unlike
    ``approx_count_distinct``."""
    e = load_table(spark, sf_dir, "events")
    return hll_distinct_estimate(e, "user_id", b=8)


@register(
    "q_hard_negatives",
    oracle="""
    WITH b AS (
      SELECT vec_id, embedding,
             (CASE WHEN embedding[1] > 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[2] > 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[3] > 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[4] > 0 THEN '1' ELSE '0' END) AS bucket,
             sqrt(list_reduce(list_transform(embedding,
                                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                              (acc, x) -> acc + x)) AS nrm
      FROM embeddings),
    p AS (
      SELECT a.vec_id AS vec_id, c.vec_id AS neg_id,
             CAST(FLOOR(1e6 *
               list_reduce(list_transform(list_zip(a.embedding, c.embedding),
                                          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                           (acc, x) -> acc + x) / (a.nrm * c.nrm))
               AS BIGINT) AS score_e6
      FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id),
    f AS (SELECT * FROM p WHERE score_e6 < 950000),
    r AS (SELECT vec_id, neg_id, score_e6,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY score_e6 DESC, neg_id ASC) AS slot
          FROM f)
    SELECT vec_id, neg_id, score_e6, CAST(slot AS INT) AS slot
    FROM r WHERE slot <= 4
    """,
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training hard negatives: per anchor, the 4 most
    similar same-sign-bucket vectors under a 0.95-cosine duplicate
    ceiling. Bucket-keyed self-join + WindowGroupLimit — the near-dup
    candidate topology reused for mining, never O(n^2)."""
    from oic_options_chains_spark.operators.similarity import hard_negatives

    e = load_table(spark, sf_dir, "embeddings")
    # broadcast opted IN here: bench-scale corpus fits one executor and
    # the anchor-side repartition parallelizes the CPU-dense cosine
    # folds (see hard_negatives docstring; default is the scale-safe
    # shuffle join)
    return hard_negatives(
        e, k=4, max_score_e6=950_000, bits=4, broadcast_candidates=True
    )


@register(
    "q_cluster_keeper",
    oracle=_CC_SQL
    + """,
    q AS (SELECT doc_id, len(string_split(lower(text), ' ')) AS n_tok
          FROM documents),
    cl AS (SELECT d.doc_id,
                  COALESCE(cc.cluster_id, d.doc_id) AS cluster_id,
                  q.n_tok
           FROM documents d
           JOIN q ON q.doc_id = d.doc_id
           LEFT JOIN cc ON d.doc_id = cc.doc_id),
    k AS (SELECT doc_id, cluster_id,
                 FIRST_VALUE(doc_id) OVER (PARTITION BY cluster_id
                                           ORDER BY n_tok DESC, doc_id ASC)
                   AS keeper_id
          FROM cl)
    SELECT doc_id, cluster_id, keeper_id,
           CAST(CASE WHEN doc_id = keeper_id THEN 1 ELSE 0 END AS INT)
             AS is_keeper
    FROM k
    """,
)
def q_cluster_keeper(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup close-out: LSH pairs -> connected components
    -> keep the LONGEST document per cluster (token count, id
    tie-break) instead of the smallest id — the production keeper rule
    that preserves the clean copy over the truncated one."""
    from oic_options_chains_spark.operators.clusters import keeper_by_quality
    from oic_options_chains_spark.operators.text import token_count_ws

    d = load_table(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(
        minhash_band_keys(doc_shingles(d, "doc_id", "text", distinct=False), "doc_id"),
        "doc_id",
    )
    scored = d.select(
        "doc_id", token_count_ws(F.col("text")).alias("n_tok")
    )
    # lsh_candidate_pairs emits distinct (a < b) pairs by contract
    return keeper_by_quality(
        scored, pairs, quality_col="n_tok", pairs_canonical=True
    )


@register(
    "q_minhash_estimate",
    oracle=_SIG_SQL
    + """,
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INT) AS band,
             string_agg(minhash, ',' ORDER BY seed) AS band_key
      FROM sig GROUP BY doc_id, seed // 4),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id)
    SELECT p.doc_a, p.doc_b,
           CAST(SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
                AS BIGINT) AS sig_matches,
           CAST(FLOOR(CAST(10000 AS DOUBLE)
                * SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END)
                / 8) AS BIGINT) AS est_bp
    FROM pairs p
    JOIN sig sa ON sa.doc_id = p.doc_a
    JOIN sig sb ON sb.doc_id = p.doc_b AND sb.seed = sa.seed
    GROUP BY p.doc_a, p.doc_b
    """,
)
def q_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality measurement: MinHash-estimated Jaccard (signature
    agreement / 8) for every LSH candidate pair — compare against
    q_ngram_jaccard to validate sketch parameters before a full-corpus
    run commits to them."""
    d = load_table(spark, sf_dir, "documents")
    sh = doc_shingles(d, "doc_id", "text", distinct=False)
    pairs = lsh_candidate_pairs(minhash_band_keys(sh, "doc_id"), "doc_id")
    return signature_agreement(sh, pairs, "doc_id", num_hashes=8)


@register(
    "q_priority_dedup",
    oracle=r"""
    WITH f AS (SELECT doc_id, source,
                      md5(regexp_replace(lower(text), '\s+', ' ', 'g'))
                        AS fingerprint,
                      CASE WHEN source = 'src0' THEN 0
                           WHEN source = 'src2' THEN 1
                           ELSE 2 END AS priority
               FROM documents),
    k AS (SELECT doc_id, fingerprint,
                 FIRST_VALUE(doc_id) OVER (PARTITION BY fingerprint
                                           ORDER BY priority ASC, doc_id ASC)
                   AS keeper_id
          FROM f)
    SELECT doc_id, keeper_id,
           CAST(CASE WHEN doc_id = keeper_id THEN 1 ELSE 0 END AS INT) AS kept
    FROM k
    """,
)
def q_priority_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-priority exact dedup: within an identical-content group,
    keep the copy from the most-trusted source (src0 > src2 > rest),
    doc_id as the tie-break — the cross-source rule real corpus merges
    need (curated copy wins over crawled copy)."""
    from oic_options_chains_spark.operators.text import fingerprint

    d = load_table(spark, sf_dir, "documents")
    pri = (
        F.when(F.col("source") == "src0", 0)
        .when(F.col("source") == "src2", 1)
        .otherwise(2)
    )
    scored = d.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fingerprint"),
        pri.alias("__p"),
    )
    w = Window.partitionBy("fingerprint")
    keeper = F.min(F.struct(F.col("__p"), F.col("doc_id").alias("i"))).over(w)["i"]
    return scored.select(
        "doc_id",
        keeper.alias("keeper_id"),
        (F.col("doc_id") == keeper).cast("int").alias("kept"),
    )


@register(
    "q_token_vocab",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
                 FROM documents),
    c AS (SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
          FROM tok GROUP BY token HAVING COUNT(*) >= 5)
    SELECT token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
           CAST(row_number() OVER (ORDER BY tf DESC, token ASC) AS BIGINT)
             AS vocab_id
    FROM c
    """,
)
def q_token_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-prep vocabulary: corpus term/document frequencies with
    frequency-ranked ids (tf >= 5). The rank sort runs over the bounded
    vocabulary, never the corpus."""
    from oic_options_chains_spark.operators.vocab import token_vocab

    d = load_table(spark, sf_dir, "documents")
    return token_vocab(d, min_tf=5)


@register(
    "q_oov_rate",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
                 FROM documents),
    c AS (SELECT token FROM tok GROUP BY token HAVING COUNT(*) >= 5)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN c.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(FLOOR(CAST(10000 AS DOUBLE)
                * SUM(CASE WHEN c.token IS NULL THEN 1 ELSE 0 END)
                / COUNT(*)) AS BIGINT) AS oov_bp
    FROM tok t LEFT JOIN c ON t.token = c.token
    GROUP BY t.doc_id
    """,
)
def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus vocabulary
    — the post-hoc gate that catches mis-languaged or binary-garbage
    documents the earlier quality filters passed. Vocab broadcasts; the
    corpus never reshuffles."""
    from oic_options_chains_spark.operators.vocab import oov_stats, token_vocab

    d = load_table(spark, sf_dir, "documents")
    return oov_stats(d, token_vocab(d, min_tf=5))


@register(
    "q_dataset_manifest",
    oracle="""
    WITH s AS (
      SELECT doc_id, source, n_chars,
             len(string_split(lower(text), ' ')) AS n_tok,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INT) % 100 AS b,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) AS idh
      FROM documents),
    t AS (SELECT doc_id, source, n_chars, n_tok, idh,
                 CASE WHEN b < 90 THEN 'train'
                      WHEN b < 95 THEN 'val'
                      ELSE 'test' END AS split
          FROM s)
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(idh) AS BIGINT) AS id_checksum,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM t GROUP BY source, split
    """,
)
def q_dataset_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card manifest per (source, split): row/token/char totals
    plus an order-insensitive integer id checksum — the audit artifact a
    training-data release ships so any engine can re-derive and verify
    membership without comparing raw rows. One corpus aggregation."""
    from oic_options_chains_spark.operators.sampling import split_assign
    from oic_options_chains_spark.operators.text import token_count_ws

    d = load_table(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        "source",
        "n_chars",
        token_count_ws(F.col("text")).alias("n_tok"),
        split_assign(F.col("doc_id")).alias("split"),
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint")
        .alias("idh"),
    )
    return s.groupBy("source", "split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tok").cast("bigint").alias("sum_tokens"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum("idh").cast("bigint").alias("id_checksum"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
        F.max("doc_id").cast("bigint").alias("max_doc_id"),
    )


@register(
    "q_media_headers",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             CASE
               WHEN doc_id % 3 = 0 THEN
                 (unhex('89504E470D0A1A0A0000000D49484452') ||
                  unhex(lpad(hex(16 + doc_id % 1024), 8, '0')) ||
                  unhex(lpad(hex(16 + (doc_id * 7) % 1024), 8, '0')) ||
                  unhex('08060000') || encode(text))
               WHEN doc_id % 3 = 1 THEN (unhex('FFD8FFE0') || encode(text))
               ELSE encode(text)
             END AS content
      FROM documents),
    h AS (SELECT doc_id, hex(content) AS hx FROM b),
    p AS (SELECT doc_id, hx,
                 CASE
                   WHEN starts_with(hx, '89504E470D0A1A0A') THEN 'png'
                   WHEN starts_with(hx, 'FFD8FF') THEN 'jpeg'
                   WHEN starts_with(hx, '47494638') THEN 'gif'
                   WHEN starts_with(hx, '52494646') THEN 'riff'
                   WHEN starts_with(hx, '494433') THEN 'mp3'
                   WHEN starts_with(hx, '255044462D') THEN 'pdf'
                   ELSE 'unknown'
                 END AS format
          FROM h)
    SELECT doc_id, format,
           CASE WHEN format = 'png'
                THEN CAST(concat('0x', substring(hx, 33, 8)) AS INT) END AS width,
           CASE WHEN format = 'png'
                THEN CAST(concat('0x', substring(hx, 41, 8)) AS INT) END AS height,
           CAST(length(hx) // 2 AS BIGINT) AS n_bytes
    FROM p
    """,
)
def q_media_headers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Codec-free media metadata: magic-byte format sniffing plus PNG
    IHDR dimension parsing as pure JVM binary/hex expressions — the
    route-and-quarantine step a 100 TB media pipeline runs before any
    decoder touches a blob. Blobs are synthesized here (a valid PNG
    header, a JPEG magic, or raw text by doc_id ring) since the test
    tables carry no real media; the parsers are the production ones."""
    from oic_options_chains_spark.operators.multimodal import (
        png_dimensions,
        sniff_format,
    )

    d = load_table(spark, sf_dir, "documents")
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A0000000D49484452")),
        F.unhex(F.lpad(F.hex(16 + F.col("doc_id") % 1024), 8, "0")),
        F.unhex(F.lpad(F.hex(16 + (F.col("doc_id") * 7) % 1024), 8, "0")),
        F.unhex(F.lit("08060000")),
        F.encode(F.col("text"), "UTF-8"),
    )
    jpeg = F.concat(F.unhex(F.lit("FFD8FFE0")), F.encode(F.col("text"), "UTF-8"))
    blob = (
        F.when(F.col("doc_id") % 3 == 0, png)
        .when(F.col("doc_id") % 3 == 1, jpeg)
        .otherwise(F.encode(F.col("text"), "UTF-8"))
    )
    b = d.select(F.col("doc_id"), blob.alias("content"))
    dims = png_dimensions(F.col("content"))
    return b.select(
        "doc_id",
        sniff_format(F.col("content")).alias("format"),
        dims["width"].alias("width"),
        dims["height"].alias("height"),
        F.octet_length(F.col("content")).cast("bigint").alias("n_bytes"),
    )


@register(
    "q_cms_heavyhitters",
    oracle="""
    WITH rows_ AS (
      SELECT CAST(user_id AS VARCHAR) AS s, user_id FROM events),
    cells AS (
      SELECT j AS row_idx,
             CAST('0x' || substr(md5(s), 8*j + 1, 8) AS BIGINT) % 256 AS pos
      FROM rows_ CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
    sketch AS (
      SELECT row_idx, pos, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY row_idx, pos),
    probes AS (SELECT DISTINCT user_id FROM events WHERE user_id < 5),
    pcells AS (
      SELECT user_id, j AS row_idx,
             CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 8*j + 1, 8)
                  AS BIGINT) % 256 AS pos
      FROM probes CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)),
    est AS (
      SELECT p.user_id, CAST(MIN(s.cnt) AS BIGINT) AS est
      FROM pcells p JOIN sketch s ON p.row_idx = s.row_idx AND p.pos = s.pos
      GROUP BY p.user_id),
    truth AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_n
              FROM events WHERE user_id < 5 GROUP BY user_id)
    SELECT t.user_id, e.est, t.true_n
    FROM truth t JOIN est e ON t.user_id = e.user_id
    """,
)
def q_cms_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimates vs truth for 5 probe users:
    the mergeable counter sketch (depth 4 x width 256, md5-chunk rows)
    whose build shuffles a bounded counter dictionary, never the event
    stream. est >= true_n by construction; the driver hash locks the
    exact counter arithmetic on both engines."""
    from oic_options_chains_spark.operators.sketches import cms_counters, cms_estimate

    e = load_table(spark, sf_dir, "events")
    sketch = cms_counters(e, F.col("user_id"), depth=4, width=256)
    probes = e.select("user_id").filter(F.col("user_id") < 5).distinct()
    est = cms_estimate(sketch, probes, "user_id", depth=4, width=256)
    truth = (
        e.filter(F.col("user_id") < 5)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_n"))
    )
    return truth.join(est, "user_id").select("user_id", "est", "true_n")


@register(
    "q_stratified_split",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS r,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents)
    SELECT doc_id, lang,
           CASE WHEN r * 100 <= n * 5 THEN 'test'
                WHEN r * 100 <= n * 10 THEN 'val'
                ELSE 'train' END AS split
    FROM ranked
    """,
)
def q_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language 5/5/90 split (operators/sampling.stratified_split):
    every stratum contributes floor-exact counts to test/val — the
    guarantee hash bucketing (q_split_assign) only gives in expectation.
    One parallel window per stratum, integer threshold math."""
    from oic_options_chains_spark.operators.sampling import stratified_split

    d = load_table(spark, sf_dir, "documents")
    return stratified_split(d, ["lang"], "doc_id").select("doc_id", "lang", "split")


@register(
    "q_quality_bins",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS r,
             COUNT(*) OVER () AS n
      FROM documents)
    SELECT doc_id, n_chars, CAST((r - 1) * 10 // n + 1 AS INT) AS bin
    FROM ranked
    """,
)
def q_quality_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-count length deciles for curriculum scheduling
    (operators/sampling.rank_bins): exact global rank via the two-phase
    range-repartition form — no single-reducer global window — then the
    engine-portable (rank-1)*bins div n + 1 assignment."""
    from oic_options_chains_spark.operators.sampling import rank_bins

    d = load_table(spark, sf_dir, "documents")
    return rank_bins(d, ["n_chars", "doc_id"], n_bins=10).select(
        "doc_id", "n_chars", "bin"
    )


@register(
    "q_snapshot_diff",
    oracle="""
    WITH old AS (
      SELECT doc_id, md5(text) AS fp FROM documents WHERE doc_id % 10 < 8),
    new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END) AS fp
      FROM documents WHERE doc_id % 10 >= 2)
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                WHEN o.fp <> n.fp THEN 'changed'
                ELSE 'kept' END AS status,
           o.fp AS old_fp, n.fp AS new_fp
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-to-release dataset diff (operators/cdc.snapshot_diff):
    one full-outer co-partitioned join classifying every doc as
    added/removed/changed/kept by content fingerprint. The two versions
    are carved from the documents table (80% old, 80% new, a 1-in-7
    text mutation) so the oracle proves all four statuses."""
    from oic_options_chains_spark.operators.cdc import snapshot_diff

    d = load_table(spark, sf_dir, "documents")
    old = d.filter(F.col("doc_id") % 10 < 8).select(
        "doc_id", F.md5(F.col("text")).alias("fp")
    )
    new = d.filter(F.col("doc_id") % 10 >= 2).select(
        "doc_id",
        F.md5(
            F.when(F.col("doc_id") % 7 == 0, F.upper(F.col("text"))).otherwise(
                F.col("text")
            )
        ).alias("fp"),
    )
    return snapshot_diff(old, new, "doc_id")


@register(
    "q_hll_merge",
    oracle=f"""
    -- Output-type contract: HUGEINT intermediates are fine, but every
    -- OUTPUT column must be CAST to BIGINT (the driver's pandas hash
    -- path degrades HUGEINT to float64); tests/test_oracle_types.py
    -- enforces this for all oracles.
    WITH h AS (SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h
               FROM events GROUP BY 1, 2),
    r AS (SELECT event_type,
                 CAST(concat('0x', substring(h, 1, 2)) AS INT) AS reg,
                 CAST(concat('0x', substring(h, 3, 13)) AS BIGINT) AS v
          FROM h),
    shard AS (SELECT event_type, reg,
                     MAX(IF(v = 0, 53, 53 - length(bin(v)))) AS rho
              FROM r GROUP BY event_type, reg),
    merged AS (SELECT reg, MAX(rho) AS rho FROM shard GROUP BY reg),
    agg AS (SELECT COUNT(*) AS n_regs,
                   COALESCE(SUM((CAST(1 AS BIGINT) << (53 - rho))),
                            CAST(0 AS BIGINT)) AS t
            FROM merged),
    est AS (SELECT CAST(256 - n_regs AS BIGINT) AS n_zero_regs,
                   CAST(CAST('{_HLL_NUM_256}' AS HUGEINT)
                        // CAST(t + (CAST(1 AS BIGINT) << 53) * (256 - n_regs)
                                AS HUGEINT) AS BIGINT) AS raw_est
            FROM agg),
    m_est AS (SELECT CAST(IF(raw_est <= 640 AND n_zero_regs > 0,
                             ([{_HLL_TABLE_256}])[CAST(n_zero_regs AS INT)],
                             raw_est) AS BIGINT) AS merged_estimate
              FROM est),
    dh AS (SELECT md5(CAST(user_id AS VARCHAR)) AS h FROM events GROUP BY 1),
    dr AS (SELECT CAST(concat('0x', substring(h, 1, 2)) AS INT) AS reg,
                  CAST(concat('0x', substring(h, 3, 13)) AS BIGINT) AS v
           FROM dh),
    dm AS (SELECT reg, MAX(IF(v = 0, 53, 53 - length(bin(v)))) AS rho
           FROM dr GROUP BY reg),
    dagg AS (SELECT COUNT(*) AS n_regs,
                    COALESCE(SUM((CAST(1 AS BIGINT) << (53 - rho))),
                             CAST(0 AS BIGINT)) AS t
             FROM dm),
    dest AS (SELECT CAST(256 - n_regs AS BIGINT) AS n_zero_regs,
                    CAST(CAST('{_HLL_NUM_256}' AS HUGEINT)
                         // CAST(t + (CAST(1 AS BIGINT) << 53) * (256 - n_regs)
                                 AS HUGEINT) AS BIGINT) AS raw_est
             FROM dagg),
    d_est AS (SELECT CAST(IF(raw_est <= 640 AND n_zero_regs > 0,
                             ([{_HLL_TABLE_256}])[CAST(n_zero_regs AS INT)],
                             raw_est) AS BIGINT) AS direct_estimate
              FROM dest)
    SELECT CAST(256 AS BIGINT) AS m, direct_estimate, merged_estimate
    FROM d_est CROSS JOIN m_est
    """,
)
def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch mergeability, proven in-data: per-event-type HLL register
    sets (the shard-local sketches) union-merged with MAX per register
    give the SAME estimate as sketching the whole stream directly —
    the associativity that lets 100 TB sketch per source/day/shard and
    combine bounded register relations instead of re-scanning raw data
    (operators/sketches.hll_group_registers / hll_merge_registers)."""
    from oic_options_chains_spark.operators.sketches import (
        hll_distinct_estimate,
        hll_estimate_from_registers,
        hll_group_registers,
        hll_merge_registers,
    )

    e = load_table(spark, sf_dir, "events")
    shard = hll_group_registers(e, "user_id", "event_type", b=8)
    merged = hll_estimate_from_registers(
        hll_merge_registers(shard), b=8
    ).selectExpr("estimate AS merged_estimate")
    direct = hll_distinct_estimate(e, "user_id", b=8).selectExpr(
        "m", "estimate AS direct_estimate"
    )
    return direct.crossJoin(merged)


@register(
    "q_kmv_merge",
    oracle="""
    -- Output-type contract: every output column CAST to BIGINT (see
    -- q_hll_merge note; tests/test_oracle_types.py enforces it).
    WITH dv AS (SELECT DISTINCT event_type, user_id FROM events),
    f AS (
      SELECT event_type,
             CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
                  AS BIGINT) / 4503599627370496.0 AS f
      FROM dv),
    gm AS (
      SELECT event_type, f,
             row_number() OVER (PARTITION BY event_type ORDER BY f) AS rn
      FROM f),
    merged AS (
      SELECT DISTINCT f FROM gm WHERE rn <= 64 ORDER BY f LIMIT 64),
    ma AS (SELECT COUNT(*) AS n_minima, MAX(f) AS m FROM merged),
    m_est AS (
      SELECT CAST(CASE WHEN n_minima < 64 THEN n_minima
                       ELSE CAST(283726776524341248 AS BIGINT)
                            // CAST(m * CAST(4503599627370496 AS DOUBLE) AS BIGINT)
                  END AS BIGINT) AS merged_estimate
      FROM ma),
    direct AS (
      SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 13))
                  AS BIGINT) / 4503599627370496.0 AS f
      FROM (SELECT DISTINCT user_id FROM events)
      ORDER BY 1 LIMIT 64),
    da AS (SELECT COUNT(*) AS n_minima, MAX(f) AS m FROM direct),
    d_est AS (
      SELECT CAST(n_minima AS BIGINT) AS n_minima,
             CAST(CASE WHEN n_minima < 64 THEN n_minima
                       ELSE CAST(283726776524341248 AS BIGINT)
                            // CAST(m * CAST(4503599627370496 AS DOUBLE) AS BIGINT)
                  END AS BIGINT) AS direct_estimate
      FROM da)
    SELECT n_minima, direct_estimate, merged_estimate
    FROM d_est CROSS JOIN m_est
    """,
)
def q_kmv_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV mergeability, proven in-data: per-event-type minima lists
    union-merged (distinct + re-take k) give the IDENTICAL estimate as
    sketching the whole stream — k smallest of a union are among each
    shard's k smallest (operators/sketches.kmv_group_minima /
    kmv_merge_minima). The shard sketches are WindowGroupLimit running
    top-k; the merge is a k-sized TakeOrderedAndProject."""
    from oic_options_chains_spark.operators.sketches import (
        kmv_distinct_estimate,
        kmv_estimate_from_minima,
        kmv_group_minima,
        kmv_merge_minima,
    )

    e = load_table(spark, sf_dir, "events")
    shard = kmv_group_minima(e, "user_id", "event_type", k=64)
    merged = kmv_estimate_from_minima(kmv_merge_minima(shard, k=64), k=64).selectExpr(
        "estimate AS merged_estimate"
    )
    direct = kmv_distinct_estimate(
        e.select(F.col("user_id").cast("string").alias("user_id")), "user_id", k=64
    ).selectExpr("n_minima", "estimate AS direct_estimate")
    return direct.crossJoin(merged)


@register(
    "q_curation_build",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
    starts AS (
      SELECT doc_id, t, unnest(range(0, greatest(len(t) - 7, 0))) AS i
      FROM toks),
    grams AS (
      SELECT doc_id, CAST(i AS INT) AS start,
             md5(array_to_string(t[i + 1 : i + 8], ' ')) AS fp
      FROM starts),
    occ AS (
      SELECT doc_id, start,
             row_number() OVER (PARTITION BY fp ORDER BY doc_id, start) AS rn
      FROM grams),
    flagged AS (SELECT doc_id, start, start + 8 AS e FROM occ WHERE rn > 1),
    wprev AS (
      SELECT doc_id, start, e,
             MAX(e) OVER (PARTITION BY doc_id ORDER BY start, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM flagged),
    isl AS (
      SELECT doc_id, start, e,
             SUM(CASE WHEN prev_max IS NULL OR start > prev_max
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY start, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM wprev),
    spans AS (SELECT doc_id, island, MIN(start) AS s, MAX(e) AS e
              FROM isl GROUP BY doc_id, island),
    rem AS (SELECT doc_id, SUM(e - s) AS n_removed FROM spans GROUP BY doc_id),
    stats AS (
      SELECT d.doc_id, d.lang, d.n_chars,
             len(t.t) AS n_tokens,
             len(t.t) - COALESCE(r.n_removed, 0) AS n_kept,
             COALESCE(r.n_removed, 0) AS n_removed
      FROM documents d
      JOIN toks t ON d.doc_id = t.doc_id
      LEFT JOIN rem r ON d.doc_id = r.doc_id),
    kept AS (SELECT * FROM stats WHERE 4 * n_removed <= n_tokens),
    split AS (
      SELECT doc_id, lang, n_chars, n_kept,
             CASE WHEN r * 100 <= n * 5 THEN 'test'
                  WHEN r * 100 <= n * 10 THEN 'val'
                  ELSE 'train' END AS split
      FROM (
        SELECT doc_id, lang, n_chars, n_kept,
               row_number() OVER (
                 PARTITION BY lang
                 ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS r,
               COUNT(*) OVER (PARTITION BY lang) AS n
        FROM kept)),
    binned AS (
      SELECT lang, split, n_kept,
             CAST((r - 1) * 10 // n + 1 AS INT) AS bin
      FROM (
        SELECT lang, split, n_kept,
               row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) AS r,
               COUNT(*) OVER () AS n
        FROM split))
    SELECT lang, split, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_kept) AS BIGINT) AS kept_tokens
    FROM binned GROUP BY lang, split, bin
    """,
)
def q_curation_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 curation flagship, composed end-to-end: duplicated-span
    removal gates documents (drop when >25% of tokens are non-canonical
    repeats), survivors get a floor-exact per-language 5/5/90 split and
    equal-count length deciles, and the output is the (lang, split,
    decile) release manifest with document and surviving-token counts —
    span_dedup -> stratified_split -> rank_bins -> manifest in ONE plan,
    every stage the already-oracle-checked operator."""
    from oic_options_chains_spark.operators.sampling import (
        rank_bins,
        stratified_split,
    )
    from oic_options_chains_spark.operators.span_dedup import dedup_spans

    d = load_table(spark, sf_dir, "documents")
    sd = dedup_spans(d, n=8).select("doc_id", "n_tokens", "n_kept", "n_removed")
    stats = d.select("doc_id", "lang", "n_chars").join(sd, "doc_id")
    # materialization barrier (the q_selection_build precedent): the
    # survivors feed global_rank, whose rank and offsets legs are
    # structurally different consumers (the offsets leg prunes to the
    # lead column, so their subtrees never canonicalize equal and the
    # runtime cannot reuse a stage between them) — without the barrier
    # the whole span-dedup pipeline (8-gram explode + fp window + island
    # windows over the corpus) re-ran once per consumer (r15 before-plan:
    # three full copies). Six scalar columns per surviving DOCUMENT —
    # the curated intermediate a release pipeline persists anyway.
    kept = stats.filter(4 * F.col("n_removed") <= F.col("n_tokens")).localCheckpoint(
        eager=True
    )
    split = stratified_split(kept, ["lang"], "doc_id")
    binned = rank_bins(split, ["n_chars", "doc_id"], n_bins=10)
    return binned.groupBy("lang", "split", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_kept").cast("bigint").alias("kept_tokens"),
    )


@register(
    "q_quality_report",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate,
             l_returnflag, l_linestatus
      FROM lineitem),
    agg AS (
      SELECT COUNT(*) AS n,
             SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS v_null,
             SUM(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                        OR l_quantity > 50 THEN 1 ELSE 0 END) AS v_range,
             SUM(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R')
                      THEN 1 ELSE 0 END) AS v_enum_rf,
             SUM(CASE WHEN l_linestatus NOT IN ('O', 'F')
                      THEN 1 ELSE 0 END) AS v_enum_ls
      FROM base),
    uniq AS (
      SELECT CAST(COALESCE(SUM(k - 1), 0) AS BIGINT) AS v,
             CAST(COALESCE(SUM(k), 0) AS BIGINT) AS n
      FROM (SELECT COUNT(*) AS k FROM base
            GROUP BY l_orderkey, l_linenumber))
    SELECT 'not_null:l_shipdate' AS check, CAST(v_null AS BIGINT) AS n_violations,
           CAST(n AS BIGINT) AS n_checked FROM agg
    UNION ALL
    SELECT 'range:l_quantity[1,50]', CAST(v_range AS BIGINT), CAST(n AS BIGINT)
    FROM agg
    UNION ALL
    SELECT 'enum:l_returnflag', CAST(v_enum_rf AS BIGINT), CAST(n AS BIGINT)
    FROM agg
    UNION ALL
    SELECT 'enum:l_linestatus', CAST(v_enum_ls AS BIGINT), CAST(n AS BIGINT)
    FROM agg
    UNION ALL
    SELECT 'unique:l_orderkey,l_linenumber', v, n FROM uniq
    """,
)
def q_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectation-suite audit (operators/validate.quality_report): every
    row-local constraint folds into ONE conditional-aggregation scan;
    uniqueness adds the single keyed aggregate. The lake-side analog of
    the reference's DDL constraints (schema.sql:24-26,48-50) — violations
    surface as an audit table a load can gate on, not as load failures."""
    from oic_options_chains_spark.operators.validate import quality_report

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_shipdate",
        "l_returnflag", "l_linestatus",
    )
    return quality_report(
        li,
        not_null=["l_shipdate"],
        ranges=[("l_quantity", 1, 50)],
        enums=[("l_returnflag", ["A", "N", "R"]), ("l_linestatus", ["O", "F"])],
        unique=["l_orderkey", "l_linenumber"],
    )


@register(
    "q_audio_chunks",
    oracle="""
    WITH w AS (
      SELECT doc_id,
             CASE CAST(doc_id % 3 AS INT)
               WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS rate,
             octet_length(encode(text)) // 2 AS n_samples
      FROM documents),
    c AS (
      SELECT doc_id, rate, n_samples,
             unnest(range(0, CAST((n_samples + 63) // 64 AS BIGINT)))
               AS chunk_idx
      FROM w WHERE n_samples > 0)
    SELECT doc_id, CAST(rate AS INT) AS sample_rate,
           CAST(n_samples AS BIGINT) AS n_samples,
           CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(chunk_idx * 64 AS BIGINT) AS start_sample,
           CAST(LEAST((chunk_idx + 1) * 64, n_samples) AS BIGINT) AS end_sample
    FROM c
    """,
)
def q_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunk manifest (operators/multimodal.wav_chunk_manifest):
    canonical 44-byte WAV headers are SYNTHESIZED around each document's
    bytes (rate ring 8k/16k/44.1k, mono 16-bit), then sample rate, block
    align, and payload size are parsed BACK from the header bytes and
    exploded into fixed 64-sample chunk boundaries — the codec-free
    work-queue manifest an ASR batch job consumes. The oracle computes
    the manifest from the synthesis arithmetic directly, so the driver
    hash proves the byte-level parser inverts the byte-level writer."""
    from oic_options_chains_spark.operators.multimodal import wav_chunk_manifest

    d = load_table(spark, sf_dir, "documents")
    rate = F.element_at(
        F.array(F.lit(8000), F.lit(16000), F.lit(44100)),
        (F.col("doc_id") % 3).cast("int") + 1,
    )
    payload = F.encode(F.col("text"), "UTF-8")
    ds = F.octet_length(payload).cast("bigint")

    def le(x, n_bytes):
        parts = [
            F.unhex(
                F.lpad(F.hex((x.cast("bigint") / F.lit(1 << (8 * i))).cast("bigint") % 256), 2, "0")
            )
            for i in range(n_bytes)
        ]
        return F.concat(*parts)

    blob = F.concat(
        F.unhex(F.lit("52494646")),          # 'RIFF'
        le(ds + 36, 4),
        F.unhex(F.lit("57415645666D7420")),  # 'WAVEfmt '
        le(F.lit(16), 4),                    # fmt chunk size
        le(F.lit(1), 2),                     # PCM
        le(F.lit(1), 2),                     # mono
        le(rate, 4),
        le(rate * 2, 4),                     # byte rate
        le(F.lit(2), 2),                     # block align
        le(F.lit(16), 2),                    # bits/sample
        F.unhex(F.lit("64617461")),          # 'data'
        le(ds, 4),
        payload,
    )
    wavs = d.select(F.col("doc_id"), blob.alias("content"))
    return wav_chunk_manifest(wavs, "content", "doc_id", samples_per_chunk=64)


@register(
    "q_split_leakage",
    oracle="WITH "
    + _SIG_SQL.removeprefix("WITH ")
    + """,
    bands AS (
      SELECT doc_id, CAST(seed // 4 AS INT) AS band,
             string_agg(minhash, ',' ORDER BY seed) AS band_key
      FROM sig GROUP BY doc_id, seed // 4),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band = b.band AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id),
    sp AS (
      SELECT doc_id,
             CASE WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                                1, 4)) AS INT) % 100 < 90
                    THEN 'train'
                  WHEN CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)),
                                                1, 4)) AS INT) % 100 < 95
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents),
    marked AS (
      SELECT p.doc_a, p.doc_b, sa.split AS split_a, sb.split AS split_b
      FROM pairs p
      JOIN sp sa ON p.doc_a = sa.doc_id
      JOIN sp sb ON p.doc_b = sb.doc_id)
    SELECT LEAST(split_a, split_b) AS split_lo,
           GREATEST(split_a, split_b) AS split_hi,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM marked GROUP BY 1, 2
    """,
)
def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test LEAKAGE audit: near-duplicate candidate pairs (MinHash
    LSH banding) joined against the hash-split assignment, aggregated by
    the split pair — any count on a (test, train)-style row is eval
    contamination a document-level dedup missed across the split
    boundary. The governance closing step the dedup literature calls
    for: dedup, split, then PROVE the split held. Broadcast-sized split
    relation, one LSH candidate join — no new corpus shuffles beyond the
    banding itself."""
    from oic_options_chains_spark.operators.minhash import (
        doc_shingles,
        lsh_candidate_pairs,
        minhash_band_keys,
    )
    from oic_options_chains_spark.operators.sampling import split_assign

    d = load_table(spark, sf_dir, "documents")
    bands = minhash_band_keys(
        doc_shingles(d, "doc_id", "text", distinct=False), "doc_id"
    )
    pairs = lsh_candidate_pairs(bands, "doc_id")
    sp = d.select("doc_id", split_assign(F.col("doc_id")).alias("split"))
    marked = (
        pairs.join(
            F.broadcast(sp.withColumnRenamed("doc_id", "doc_a")).withColumnRenamed(
                "split", "split_a"
            ),
            "doc_a",
        ).join(
            F.broadcast(sp.withColumnRenamed("doc_id", "doc_b")).withColumnRenamed(
                "split", "split_b"
            ),
            "doc_b",
        )
    )
    return marked.select(
        F.least("split_a", "split_b").alias("split_lo"),
        F.greatest("split_a", "split_b").alias("split_hi"),
    ).groupBy("split_lo", "split_hi").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )


@register(
    "q_token_budget_mix",
    oracle="""
    WITH budgets AS (
      SELECT source,
             CAST(10000 * (1 + CAST(substr(source, 4) AS INT) % 3) AS BIGINT)
               AS budget_tokens
      FROM (SELECT DISTINCT source FROM documents)),
    ranked AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_tokens
      FROM documents)
    SELECT r.doc_id, r.source, CAST(r.n_chars AS BIGINT) AS n_chars,
           CAST(r.cum_tokens AS BIGINT) AS cum_tokens
    FROM ranked r JOIN budgets b ON r.source = b.source
    WHERE r.cum_tokens <= b.budget_tokens
    """,
)
def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture (operators/sampling.token_budget_sample):
    per-source budgets in TOKENS (here a deterministic per-source rule,
    10k/20k/30k ring) admit the hash-ordered prefix of each source whose
    running char total fits — the mixing knob recipes specify, immune to
    document-length skew between sources. One parallel window per
    source; the budget relation broadcasts."""
    from oic_options_chains_spark.operators.sampling import token_budget_sample

    d = load_table(spark, sf_dir, "documents")
    budgets = (
        d.select("source")
        .distinct()
        .select(
            "source",
            (
                10000
                * (1 + F.substring("source", 4, 10).cast("int") % 3)
            ).cast("bigint").alias("budget_tokens"),
        )
    )
    out = token_budget_sample(d, "source", "n_chars", "doc_id", budgets)
    return out.select(
        "doc_id", "source", F.col("n_chars").cast("bigint").alias("n_chars"),
        "cum_tokens",
    )


@register(
    "q_feature_hashing",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
      FROM documents)
    SELECT doc_id,
           CAST(CAST(concat('0x', substr(md5(token), 1, 4)) AS INT) % 256
                AS INT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS count
    FROM tok GROUP BY 1, 2
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (operators/vocab.feature_hashing):
    vocabulary-free sparse vectors — md5 % 256 buckets, per-doc counts,
    one (doc, bucket) shuffle with map-side combine. The fixed-width
    feature map that needs no corpus pass and no dictionary broadcast."""
    from oic_options_chains_spark.operators.vocab import feature_hashing

    d = load_table(spark, sf_dir, "documents")
    return feature_hashing(d, n_features=256)


@register(
    "q_patch_grid",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             16 + doc_id % 1024 AS w,
             16 + (doc_id * 7) % 1024 AS h
      FROM documents WHERE doc_id % 3 = 0),
    g AS (SELECT doc_id, w, h,
                 unnest(range(0, (h + 31) // 32)) AS patch_row
          FROM b),
    gc AS (SELECT doc_id, w, h, patch_row,
                  unnest(range(0, (w + 31) // 32)) AS patch_col
           FROM g)
    SELECT doc_id,
           CAST(patch_row AS INT) AS patch_row,
           CAST(patch_col AS INT) AS patch_col,
           CAST(patch_col * 32 AS INT) AS x0,
           CAST(patch_row * 32 AS INT) AS y0,
           CAST(least(32, w - patch_col * 32) AS INT) AS patch_w,
           CAST(least(32, h - patch_row * 32) AS INT) AS patch_h
    FROM gc
    """,
)
def q_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style 32x32 patch manifest for every synthesized PNG blob,
    planned from HEADER dimensions alone (operators/multimodal.patch_grid
    over png_dimensions) — the patch sampling/budgeting relation a
    vision-pretraining pipeline builds before any decoder runs. Patch
    counts divide integers far below 2^53, inside the documented exact
    floor regime; the oracle derives the same grid from the blob
    synthesis arithmetic, independent of the byte-level parse path."""
    from oic_options_chains_spark.operators.multimodal import (
        patch_grid,
        png_dimensions,
    )

    d = load_table(spark, sf_dir, "documents")
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A0000000D49484452")),
        F.unhex(F.lpad(F.hex(16 + F.col("doc_id") % 1024), 8, "0")),
        F.unhex(F.lpad(F.hex(16 + (F.col("doc_id") * 7) % 1024), 8, "0")),
        F.unhex(F.lit("08060000")),
        F.encode(F.col("text"), "UTF-8"),
    )
    blobs = d.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id", png.alias("content")
    )
    dims = png_dimensions(F.col("content"))
    parsed = blobs.select(
        "doc_id", dims["width"].alias("width"), dims["height"].alias("height")
    )
    return patch_grid(parsed, id_col="doc_id", patch=32)


@register(
    "q_media_dims_ext",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             16 + doc_id % 1024 AS w,
             16 + (doc_id * 7) % 1024 AS h,
             doc_id % 5 AS ring
      FROM documents),
    blob AS (
      SELECT doc_id, w, h,
             CASE
               WHEN ring = 0 THEN
                 (unhex('89504E470D0A1A0A0000000D49484452') ||
                  unhex(lpad(hex(w), 8, '0')) ||
                  unhex(lpad(hex(h), 8, '0')) || unhex('08060000'))
               WHEN ring = 1 THEN
                 (unhex('474946383961') ||
                  unhex(lpad(hex(w % 256), 2, '0')) ||
                  unhex(lpad(hex(w // 256), 2, '0')) ||
                  unhex(lpad(hex(h % 256), 2, '0')) ||
                  unhex(lpad(hex(h // 256), 2, '0')) || unhex('00'))
               WHEN ring = 2 THEN
                 (unhex('424D') || unhex(repeat('00', 16)) ||
                  unhex(lpad(hex(w % 256), 2, '0')) ||
                  unhex(lpad(hex(w // 256), 2, '0')) || unhex('0000') ||
                  unhex(lpad(hex(h % 256), 2, '0')) ||
                  unhex(lpad(hex(h // 256), 2, '0')) || unhex('0000'))
               WHEN ring = 3 THEN
                 (unhex('FFD8FFE000104A46494600010100000100010000FFFE00040000') ||
                  unhex(CASE WHEN doc_id % 2 = 0 THEN 'FFC0' ELSE 'FFC2' END) ||
                  unhex('001108') ||
                  unhex(lpad(hex(h), 4, '0')) ||
                  unhex(lpad(hex(w), 4, '0')) ||
                  unhex('03011100021101031101'))
               ELSE unhex('00')
             END AS content
      FROM b),
    h AS (SELECT doc_id, w, h AS ph, hex(content) AS hx FROM blob),
    p AS (SELECT doc_id, w, ph, hx,
                 CASE
                   WHEN starts_with(hx, '89504E470D0A1A0A') THEN 'png'
                   WHEN starts_with(hx, 'FFD8FF') THEN 'jpeg'
                   WHEN starts_with(hx, '47494638') THEN 'gif'
                   ELSE CASE WHEN starts_with(hx, '424D')
                             THEN 'bmp' ELSE 'unknown' END
                 END AS format
          FROM h)
    SELECT doc_id, format,
           CAST(CASE
             WHEN format = 'png' THEN CAST(concat('0x', substring(hx, 33, 8)) AS INT)
             WHEN format = 'gif' THEN
               CAST(concat('0x', substring(hx, 13, 2)) AS INT)
               + 256 * CAST(concat('0x', substring(hx, 15, 2)) AS INT)
             WHEN format = 'bmp' THEN
               CAST(concat('0x', substring(hx, 37, 2)) AS INT)
               + 256 * CAST(concat('0x', substring(hx, 39, 2)) AS INT)
             -- jpeg: the oracle reports the PLANTED width; the Spark
             -- side must RECOVER it from the SOF marker walk
             WHEN format = 'jpeg' THEN w
           END AS INT) AS width,
           CAST(CASE
             WHEN format = 'png' THEN CAST(concat('0x', substring(hx, 41, 8)) AS INT)
             WHEN format = 'gif' THEN
               CAST(concat('0x', substring(hx, 17, 2)) AS INT)
               + 256 * CAST(concat('0x', substring(hx, 19, 2)) AS INT)
             WHEN format = 'bmp' THEN
               CAST(concat('0x', substring(hx, 45, 2)) AS INT)
               + 256 * CAST(concat('0x', substring(hx, 47, 2)) AS INT)
             WHEN format = 'jpeg' THEN ph
           END AS INT) AS height
    FROM p
    """,
)
def q_media_dims_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header-dimension parsing across FOUR container formats — PNG
    (big-endian IHDR), GIF (little-endian screen descriptor), BMP
    (little-endian BITMAPINFOHEADER), JPEG (bounded SOF marker walk:
    baseline SOF0 on even doc_ids, progressive SOF2 on odd, behind a
    JFIF APP0 + COM preamble) — over a synthesized format ring. Pure
    JVM hex arithmetic (operators/multimodal.{png,gif,bmp,jpeg}_
    dimensions); the router a mixed media lake runs before scheduling
    any decoder. The oracle plants the JPEG dims and reports them from
    ground truth, so the Spark side must RECOVER them from the marker
    walk to match."""
    from oic_options_chains_spark.operators.multimodal import (
        bmp_dimensions,
        gif_dimensions,
        jpeg_dimensions,
        png_dimensions,
        sniff_format,
    )

    d = load_table(spark, sf_dir, "documents")
    w = 16 + F.col("doc_id") % 1024
    h = 16 + (F.col("doc_id") * 7) % 1024
    le2 = lambda v: F.concat(  # noqa: E731
        F.unhex(F.lpad(F.hex(v % 256), 2, "0")),
        F.unhex(F.lpad(F.hex(F.floor(v / 256).cast("bigint")), 2, "0")),
    )
    png = F.concat(
        F.unhex(F.lit("89504E470D0A1A0A0000000D49484452")),
        F.unhex(F.lpad(F.hex(w), 8, "0")),
        F.unhex(F.lpad(F.hex(h), 8, "0")),
        F.unhex(F.lit("08060000")),
    )
    gif = F.concat(
        F.unhex(F.lit("474946383961")), le2(w), le2(h), F.unhex(F.lit("00"))
    )
    bmp = F.concat(
        F.unhex(F.lit("424D")),
        F.unhex(F.lit("00" * 16)),
        le2(w),
        F.unhex(F.lit("0000")),
        le2(h),
        F.unhex(F.lit("0000")),
    )
    sof_marker = F.when(F.col("doc_id") % 2 == 0, F.lit("FFC0")).otherwise(
        F.lit("FFC2")
    )
    jpeg = F.concat(
        F.unhex(F.lit("FFD8FFE000104A46494600010100000100010000FFFE00040000")),
        F.unhex(sof_marker),
        F.unhex(F.lit("001108")),
        F.unhex(F.lpad(F.hex(h), 4, "0")),
        F.unhex(F.lpad(F.hex(w), 4, "0")),
        F.unhex(F.lit("03011100021101031101")),
    )
    ring = F.col("doc_id") % 5
    blob = (
        F.when(ring == 0, png)
        .when(ring == 1, gif)
        .when(ring == 2, bmp)
        .when(ring == 3, jpeg)
        .otherwise(F.unhex(F.lit("00")))
    )
    withb = d.select("doc_id", blob.alias("content"))
    fmt = sniff_format(F.col("content"))
    # sniff_format reports the RIFF/BM families at container level; for
    # dims routing BMP is its own branch
    fmt = F.when(
        F.hex(F.substring(F.col("content"), 1, 2)) == "424D", "bmp"
    ).otherwise(fmt)
    pd_, gd, bd, jd = (
        png_dimensions(F.col("content")),
        gif_dimensions(F.col("content")),
        bmp_dimensions(F.col("content")),
        jpeg_dimensions(F.col("content")),
    )
    pick = lambda k: (  # noqa: E731
        F.coalesce(pd_[k], gd[k], bd[k], jd[k]).cast("int").alias(k)
    )
    return withb.select("doc_id", fmt.alias("format"), pick("width"), pick("height"))


@register(
    "q_url_canonical",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             doc_id % 2 AS m2, doc_id % 3 AS m3, doc_id % 4 AS m4,
             doc_id % 5 AS m5, doc_id % 7 AS m7, doc_id % 9 AS m9,
             doc_id % 11 AS m11
      FROM documents)
    SELECT doc_id,
           (CASE WHEN m3 = 0 THEN 'https' ELSE 'http' END || '://' ||
            'sub' || m5 || '.example' || m7 || '.com' ||
            CASE WHEN m4 = 1 THEN ':8080' ELSE '' END ||
            CASE WHEN m11 = 0 THEN '/' ELSE '/p/' || m5 || '/x' END ||
            CASE WHEN m2 = 0 THEN '?a=1&b=' || m9 ELSE '' END)
             AS canonical_url,
           ('example' || m7 || '.com') AS domain
    FROM m
    """,
)
def q_url_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization for crawl curation (operators/urls.py):
    scheme/host lowercasing, www- and default-port stripping, fragment
    and tracking-param (utm_*/gclid/fbclid/ref) removal, bytewise param
    sort, empty-path normalization, registered-domain extraction — all
    row-local JVM regexp/array arithmetic. The query synthesizes
    deliberately MESSY urls (upper-case scheme and host, WWW. prefixes,
    explicit :443/:80 default ports, tracking params, fragments) from
    doc_id arithmetic; the oracle assembles the clean canonical from
    the same arithmetic directly, so the Spark side must PARSE its way
    back to ground truth to match — the q_media_dims_ext pattern."""
    from oic_options_chains_spark.operators.urls import (
        canonical_url,
        registered_domain,
    )

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    m2, m3, m4 = did % 2, did % 3, did % 4
    m5, m7, m9, m11 = did % 5, did % 7, did % 9, did % 11
    s = lambda c: c.cast("string")  # noqa: E731
    messy = F.concat(
        F.when(m3 == 0, F.lit("HTTPS")).otherwise(F.lit("http")),
        F.lit("://"),
        F.when(m2 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.lit("Sub"), s(m5), F.lit(".Example"), s(m7), F.lit(".COM"),
        F.when(m4 == 0, F.when(m3 == 0, F.lit(":443")).otherwise(F.lit(":80")))
        .when(m4 == 1, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.when(m11 == 0, F.lit("")).otherwise(
            F.concat(F.lit("/p/"), s(m5), F.lit("/x"))
        ),
        F.when(m2 == 0, F.concat(F.lit("?utm_source=x&b="), s(m9), F.lit("&a=1")))
        .when(m3 == 1, F.lit("?gclid=zz1"))
        .otherwise(F.lit("")),
        F.when(m3 == 1, F.lit("#top")).otherwise(F.lit("")),
    )
    u = d.select("doc_id", messy.alias("url"))
    return u.select(
        "doc_id",
        canonical_url(F.col("url")).alias("canonical_url"),
        registered_domain(F.col("url")).alias("domain"),
    )


@register(
    "q_k_anonymity",
    oracle="""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM customer),
    cells AS (
      SELECT c_nationkey, c_mktsegment,
             (cents + 10000000) // 100000 AS bal_bucket,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(COUNT(DISTINCT cents) AS BIGINT) AS l_distinct
      FROM q GROUP BY 1, 2, 3)
    SELECT c_nationkey, c_mktsegment, bal_bucket, n_rows, l_distinct,
           CAST(CASE WHEN n_rows >= 5 THEN 1 ELSE 0 END AS INT) AS k_anonymous,
           CAST(CASE WHEN l_distinct >= 2 THEN 1 ELSE 0 END AS INT) AS l_diverse
    FROM cells
    """,
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy release audit (operators/privacy.k_anonymity_cells): every
    (nation, segment, balance-bucket) quasi-identifier cell with its size
    (k-anonymity) and distinct-sensitive-value count (l-diversity) in ONE
    grouped aggregate — the out-of-band counterpart to q_redact's in-band
    PII scrub. Balance goes through the DECIMAL(18,2)-cents path (the
    q_mad_outliers rule) and the bucket offset keeps the integer division
    on non-negative operands, where Spark's trunc-div and DuckDB's
    floor-div agree."""
    from oic_options_chains_spark.operators.privacy import k_anonymity_cells

    c = load_table(spark, sf_dir, "customer")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
    q = c.select(
        "c_nationkey", "c_mktsegment", cents.alias("cents")
    ).withColumn("bal_bucket", F.expr("(cents + 10000000) div 100000"))
    return k_anonymity_cells(
        q, ["c_nationkey", "c_mktsegment", "bal_bucket"], F.col("cents"), k=5, l=2
    )


@register(
    "q_anon_release",
    oracle="""
    WITH q AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM customer),
    cells AS (
      SELECT c_nationkey, c_mktsegment,
             (cents + 10000000) // 100000 AS bal_bucket,
             COUNT(*) AS n_rows, COUNT(DISTINCT cents) AS l_distinct
      FROM q GROUP BY 1, 2, 3)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST(SUM(n_rows) AS BIGINT) AS n_records,
           CAST(SUM(CASE WHEN n_rows < 5 THEN 1 ELSE 0 END) AS BIGINT)
             AS cells_below_k,
           CAST(SUM(CASE WHEN n_rows < 5 THEN n_rows ELSE 0 END) AS BIGINT)
             AS records_below_k,
           CAST(SUM(CASE WHEN l_distinct < 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS cells_below_l,
           CAST(SUM(CASE WHEN n_rows >= 5 AND l_distinct >= 2
                         THEN n_rows ELSE 0 END) AS BIGINT)
             AS records_releasable
    FROM cells
    """,
)
def q_anon_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release gate over q_k_anonymity's cells
    (operators/privacy.suppression_summary): one row saying how much of
    the corpus a suppress-below-k / suppress-non-diverse release keeps.
    The roll-up reduces CELLS (QI-domain-bounded), so it costs nothing
    beyond the cell aggregate at any scale."""
    from oic_options_chains_spark.operators.privacy import (
        k_anonymity_cells,
        suppression_summary,
    )

    c = load_table(spark, sf_dir, "customer")
    cents = (F.col("c_acctbal").cast("decimal(18,2)") * 100).cast("bigint")
    q = c.select(
        "c_nationkey",
        "c_mktsegment",
        cents.alias("cents"),
    ).withColumn("bal_bucket", F.expr("(cents + 10000000) div 100000"))
    cells = k_anonymity_cells(
        q, ["c_nationkey", "c_mktsegment", "bal_bucket"], F.col("cents"), k=5, l=2
    )
    return suppression_summary(cells, ["c_nationkey", "c_mktsegment", "bal_bucket"])


@register(
    "q_source_calibration",
    oracle="""
    WITH base AS (SELECT doc_id, source, n_chars FROM documents),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base),
    g AS (SELECT doc_id, source,
                 row_number() OVER (ORDER BY n_chars, doc_id) AS grank
          FROM base),
    gb AS (SELECT g.doc_id, g.source,
                  CAST((g.grank - 1) * 10 // n.n + 1 AS INT) AS global_bin
           FROM g CROSS JOIN n),
    s AS (SELECT doc_id,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS srank,
                 COUNT(*) OVER (PARTITION BY source) AS sn
          FROM base)
    SELECT gb.source, CAST((s.srank - 1) * 10 // s.sn + 1 AS INT) AS src_bin,
           gb.global_bin, CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM gb JOIN s ON s.doc_id = gb.doc_id
    GROUP BY 1, 2, 3
    """,
)
def q_source_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source score-calibration matrix
    (operators/sampling.source_calibration): per-source vs global
    equal-count deciles of the length score, as a (source, src_bin,
    global_bin, n) contingency table — the audit that catches a source
    scoring on its own scale before a shared quality threshold is
    applied. Exact integer binning (the rank_bins rule, never NTILE);
    the global side rides the two-phase global_rank, no global sort."""
    from oic_options_chains_spark.operators.sampling import source_calibration

    d = load_table(spark, sf_dir, "documents")
    return source_calibration(
        d.select("doc_id", "source", "n_chars"),
        "source",
        ["n_chars", "doc_id"],
        n_bins=10,
    )


@register(
    "q_isotonic",
    oracle="""
    WITH base AS (SELECT doc_id, source, n_chars,
                         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t
                  FROM documents),
    r AS (SELECT source, t,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS rr,
                 COUNT(*) OVER (PARTITION BY source) AS n
          FROM base),
    bins AS (SELECT source, CAST((rr - 1) * 5 // n + 1 AS INT) AS bin,
                    CAST(COUNT(*) AS BIGINT) AS n_docs,
                    CAST(SUM(t) AS BIGINT) AS n_pos
             FROM r GROUP BY 1, 2),
    pre AS (SELECT source, bin, n_docs, n_pos,
                   CAST(SUM(n_docs) OVER w AS BIGINT) AS cn,
                   CAST(SUM(n_pos) OVER w AS BIGINT) AS cp
            FROM bins
            WINDOW w AS (PARTITION BY source ORDER BY bin
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
    iv AS (SELECT l.source, l.bin AS j, h.bin AS k,
                  h.cp - (l.cp - l.n_pos) AS p,
                  h.cn - (l.cn - l.n_docs) AS n
           FROM pre l JOIN pre h ON l.source = h.source AND h.bin >= l.bin),
    ivx AS (SELECT source, j, k, p, n,
                   CAST(unnest(range(j, k + 1)) AS INT) AS i,
                   CAST(p AS DOUBLE) / CAST(n AS DOUBLE) AS ratio
            FROM iv),
    mn AS (SELECT source, i, j, p, n, ratio FROM (
             SELECT *, row_number() OVER (PARTITION BY source, i, j
                                          ORDER BY ratio ASC, k ASC) AS rn
             FROM ivx) WHERE rn = 1),
    mx AS (SELECT source, i AS bin,
                  CAST((1000000 * p) // n AS BIGINT) AS iso_e6
           FROM (SELECT *, row_number() OVER (PARTITION BY source, i
                                              ORDER BY ratio DESC, j ASC) AS rx
                 FROM mn) WHERE rx = 1)
    SELECT b.source, b.bin, b.n_docs, b.n_pos,
           CAST((1000000 * b.n_pos) // b.n_docs AS BIGINT) AS rate_e6,
           m.iso_e6
    FROM bins b JOIN mx m ON b.source = m.source AND b.bin = m.bin
    """,
)
def q_isotonic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source isotonic calibration (operators/robust.
    isotonic_calibration): the monotone best fit of the English-rate
    curve over each source's length-score quintiles — the PAV step that
    makes heuristic scores comparable ACROSS sources before a shared
    threshold. Computed via the minimax closed form (three relational
    passes over the bin relation) instead of PAV's driver-hostile
    sequential merge stack."""
    from oic_options_chains_spark.operators.robust import isotonic_calibration

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        "source",
        "n_chars",
        (F.col("lang") == "en").cast("int").alias("is_en"),
    )
    return isotonic_calibration(
        base, "source", ["n_chars", "doc_id"], "is_en", n_bins=5
    )
