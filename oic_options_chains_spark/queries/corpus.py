"""Corpus-preparation t2 queries: chunking, decontamination, repetition
quality gates, BM25 weighting, and deterministic shard ordering — the
operators between a deduplicated corpus and a training run.

Same cross-engine rules as queries/extensions.py: md5 for all hashing,
FLOOR-scaled integers for every ratio (no logarithms — libm last-ulp
drift breaks value hashes), and no DecimalType in any final schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.chunking import (
    chunk_documents,
    pack_stream_offsets,
)
from oic_options_chains_spark.operators.decontam import (
    boilerplate_scores,
    contamination_counts,
)
from oic_options_chains_spark.operators.ranking import bm25_components
from oic_options_chains_spark.operators.repetition import repetition_metrics
from oic_options_chains_spark.operators.sampling import global_shuffle
from oic_options_chains_spark.operators.text import (
    quality_metrics,
    redact_terms,
    token_count_ws,
)
from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table


@register(
    "q_chunk_docs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents),
    s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    st AS (SELECT doc_id, toks, n,
                  unnest(range(0, greatest(n - 16, 1), 48)) AS start
           FROM s)
    SELECT doc_id,
           CAST(start // 48 AS INT) AS chunk_id,
           CAST(start AS INT) AS start_token,
           CAST(len(toks[start + 1 : least(start + 64, n)]) AS INT)
             AS n_chunk_tokens,
           array_to_string(toks[start + 1 : least(start + 64, n)], ' ')
             AS chunk_text
    FROM st
    """,
)
def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-token windows with 16-token overlap: row-local array math, so a
    chunked corpus scan is still a shuffle-free scan."""
    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, window=64, overlap=16)


@register(
    "q_chunk_dedup",
    oracle=r"""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents),
    s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    st AS (SELECT doc_id, toks, n,
                  unnest(range(0, greatest(n - 16, 1), 48)) AS start
           FROM s),
    ch AS (SELECT doc_id, start,
                  md5(array_to_string(
                        toks[start + 1 : least(start + 64, n)], ' '))
                    AS chunk_fp
           FROM st)
    SELECT chunk_fp,
           CAST(COUNT(*) AS BIGINT) AS copies,
           CAST(MIN(doc_id * 4294967296 + start) AS BIGINT) AS keeper
    FROM ch GROUP BY chunk_fp
    """,
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity exact dedup — the practical unit for RAG/training
    stores: chunk (64/16 windows), fingerprint each chunk, hash-groupBy.
    Composition of chunk_documents + the dedup_exact pattern; the keeper
    key packs (doc_id, start) as doc_id * 2^32 + start so ties resolve
    deterministically — a 2^32 shift keeps start_token in its own bit
    range for any document under 4B tokens (a decimal shift like 1e5
    would let a >=100k-token document corrupt the doc_id ordering)."""
    d = load_table(spark, sf_dir, "documents")
    ch = chunk_documents(d, window=64, overlap=16)
    return (
        ch.select(
            "doc_id",
            "start_token",
            F.md5(F.col("chunk_text")).alias("chunk_fp"),
        )
        .groupBy("chunk_fp")
        .agg(
            F.count(F.lit(1)).alias("copies"),
            F.min(
                F.col("doc_id") * F.lit(4294967296) + F.col("start_token")
            ).cast("bigint").alias("keeper"),
        )
    )


@register(
    "q_decontaminate",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
    idx AS (SELECT doc_id, t,
                   unnest(range(0, greatest(len(t) - 2, 0))) AS i
            FROM toks),
    sh AS (SELECT DISTINCT doc_id,
                  t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS shingle
           FROM idx),
    bench AS (SELECT DISTINCT shingle
              FROM sh JOIN documents USING (doc_id)
              WHERE source = 'src9'),
    corp AS (SELECT sh.doc_id, sh.shingle
             FROM sh JOIN documents USING (doc_id)
             WHERE source <> 'src9'),
    hits AS (SELECT doc_id, COUNT(*) AS n
             FROM corp JOIN bench USING (shingle)
             GROUP BY doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(n, 0) AS BIGINT) AS n_overlap,
           CAST(CASE WHEN COALESCE(n, 0) > 0 THEN 1 ELSE 0 END AS INT)
             AS contaminated
    FROM documents d LEFT JOIN hits USING (doc_id)
    WHERE d.source <> 'src9'
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: treat source src9 as the held-out eval
    set and count 3-gram shingles each remaining document shares with it.
    The benchmark shingle set broadcasts; the corpus never shuffles for
    the join."""
    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("source") != "src9")
    bench = d.filter(F.col("source") == "src9")
    out = contamination_counts(corpus, bench)
    return out.select(
        "doc_id",
        "n_overlap",
        F.col("contaminated").cast("int").alias("contaminated"),
    )


@register(
    "q_winnow",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
    idx AS (SELECT doc_id, t,
                   unnest(range(0, greatest(len(t) - 2, 0))) AS i
            FROM toks),
    grams AS (SELECT doc_id, i AS pos,
                     md5(t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]) AS h
              FROM idx),
    rolled AS (SELECT doc_id,
                      MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                                   ROWS BETWEEN CURRENT ROW
                                   AND 3 FOLLOWING) AS fingerprint,
                      COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS BETWEEN CURRENT ROW
                                     AND 3 FOLLOWING) AS n
               FROM grams)
    SELECT DISTINCT doc_id, fingerprint FROM rolled WHERE n = 4
    """,
)
def q_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint sets (k=3-gram hashes, window w=4): any
    shared 6-token run between two documents is guaranteed to share a
    fingerprint, at a fraction of full-shingle density."""
    from oic_options_chains_spark.operators.minhash import winnow_fingerprints

    d = load_table(spark, sf_dir, "documents")
    return winnow_fingerprints(d, k=3, w=4)


@register(
    "q_boilerplate",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
    idx AS (SELECT doc_id, t,
                   unnest(range(0, greatest(len(t) - 2, 0))) AS i
            FROM toks),
    sh AS (SELECT DISTINCT doc_id,
                  t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS shingle
           FROM idx),
    freq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY shingle)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN freq.df >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_boiler,
           CAST(FLOOR(10000.0 *
                CAST(SUM(CASE WHEN freq.df >= 3 THEN 1 ELSE 0 END) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS boiler_bp
    FROM sh JOIN freq USING (shingle)
    GROUP BY sh.doc_id
    """,
)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-global boilerplate gate: fraction of each document's
    3-gram shingles that appear in >= 3 distinct documents."""
    d = load_table(spark, sf_dir, "documents")
    return boilerplate_scores(d, df_threshold=3)


@register(
    "q_repetition",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
                 FROM documents),
    cnt AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
    top AS (SELECT doc_id, MAX(c) AS top_n, SUM(c) AS n_tok
            FROM cnt GROUP BY doc_id),
    arr AS (SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents),
    bgi AS (SELECT doc_id, t,
                   unnest(range(0, greatest(len(t) - 1, 0))) AS i
            FROM arr),
    bgs AS (SELECT doc_id, t[i+1] || ' ' || t[i+2] AS b FROM bgi),
    bstat AS (SELECT doc_id, COUNT(*) AS n_bg, COUNT(DISTINCT b) AS n_bd
              FROM bgs GROUP BY doc_id)
    SELECT top.doc_id,
           CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(top_n AS BIGINT) AS top_token_n,
           CAST(FLOOR(10000.0 * CAST(top_n AS DOUBLE) / CAST(n_tok AS DOUBLE))
                AS BIGINT) AS top_token_bp,
           CAST(CASE WHEN COALESCE(n_bg, 0) > 0
                     THEN FLOOR(10000.0 * CAST(n_bg - n_bd AS DOUBLE)
                                / CAST(n_bg AS DOUBLE))
                     ELSE 0 END AS BIGINT) AS dup_bigram_bp
    FROM top LEFT JOIN bstat ON top.doc_id = bstat.doc_id
    """,
)
def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gates: top-token coverage and duplicate-
    bigram fraction, both row-local (no shuffle — a filtered scan stays a
    scan)."""
    d = load_table(spark, sf_dir, "documents")
    m = repetition_metrics(F.col("text"))
    return d.select(
        "doc_id",
        m["n_tokens"].alias("n_tokens"),
        m["top_token_n"].alias("top_token_n"),
        m["top_token_bp"].alias("top_token_bp"),
        m["dup_bigram_bp"].alias("dup_bigram_bp"),
    )


@register(
    "q_bm25",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
                 FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
    dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
    ad AS (SELECT CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
           FROM dl),
    dfq AS (SELECT term, COUNT(*) AS doc_freq FROM tf GROUP BY term),
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM dl)
    SELECT tf.doc_id, tf.term,
           CAST(tf.tf AS BIGINT) AS tf,
           CAST(dfq.doc_freq AS BIGINT) AS doc_freq,
           CAST(dl.dl AS BIGINT) AS dl,
           CAST(FLOOR(1000000.0 *
                ((CAST(tf.tf AS DOUBLE) * 2.2)
                 / (CAST(tf.tf AS DOUBLE)
                    + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl))))
             AS BIGINT) AS tf_sat_e6,
           CAST(FLOOR(1000000.0 *
                ((n - CAST(doc_freq AS DOUBLE) + 0.5)
                 / (CAST(doc_freq AS DOUBLE) + 0.5)))
             AS BIGINT) AS idf_rational_e6
    FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id)
    CROSS JOIN ad CROSS JOIN nd
    """,
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 factors per (doc, term): saturated tf and the idf rational,
    floor-scaled to integers (the monotone log stays engine-local). Two
    corpus shuffles total; vocabulary and avgdl broadcast back."""
    d = load_table(spark, sf_dir, "documents")
    return bm25_components(d)


@register(
    "q_mixture_sample",
    oracle="""
    WITH w(source, w) AS (VALUES ('src0', 3), ('src1', 1), ('src2', 1),
                                 ('src3', 2), ('src5', 3)),
    cnt AS (SELECT w.source, COUNT(d.doc_id) AS n, ANY_VALUE(w.w) AS w
            FROM w LEFT JOIN documents d USING (source)
            GROUP BY w.source),
    cap AS (SELECT MIN(n * 10 // w) AS t_total FROM cnt),
    quota AS (SELECT source, w * t_total // 10 AS quota
              FROM cnt CROSS JOIN cap),
    ranked AS (SELECT d.doc_id, d.source,
                      row_number() OVER (
                        PARTITION BY d.source
                        ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id)
                        AS rank
               FROM documents d JOIN w USING (source))
    SELECT r.doc_id, r.source, CAST(r.rank AS BIGINT) AS rank
    FROM ranked r JOIN quota q USING (source)
    WHERE r.rank <= q.quota
    """,
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source mixing: weights 3/1/1/2/3 over five sources
    (the rest excluded); every source fills its integer quota from the
    largest total all sources can jointly supply."""
    from oic_options_chains_spark.operators.sampling import mixture_sample

    d = load_table(spark, sf_dir, "documents")
    out = mixture_sample(
        d, "source", "doc_id",
        {"src0": 3, "src1": 1, "src2": 1, "src3": 2, "src5": 3},
    )
    return out.select("doc_id", "source", "rank")


@register(
    "q_pack_sequences",
    oracle="""
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                        AS n_tokens,
                      CAST(concat('0x',
                           substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                           AS INT) % 8 AS shard,
                      md5(CAST(doc_id AS VARCHAR)) AS hh
               FROM documents),
    c AS (SELECT doc_id, shard, n_tokens,
                 SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY hh, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM t)
    SELECT doc_id, CAST(shard AS INT) AS shard, n_tokens,
           CAST(cum - n_tokens AS BIGINT) AS stream_start,
           CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_index,
           CAST((cum - n_tokens) % 256 AS BIGINT) AS seq_offset
    FROM c
    """,
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-split sequence packing: md5-ordered document stream
    cut into 256-token training sequences, sharded so the cumsum never
    serializes on one task."""
    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", token_count_ws(F.col("text")).alias("n_tokens")
    )
    return pack_stream_offsets(sized, key="doc_id", context=256, n_shards=8)


@register(
    "q_redact",
    oracle=r"""
    SELECT doc_id,
           md5(regexp_replace(lower(text), '\b(the|a|of|and|or)\b',
                              '<TERM>', 'g')) AS redacted_md5,
           CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|or)\b'))
                AS BIGINT) AS n_redacted
    FROM documents
    """,
)
def q_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denylist scrubbing / PII-style redaction with an audit count; the
    redacted text is md5-digested to keep the output narrow."""
    d = load_table(spark, sf_dir, "documents")
    r = redact_terms(F.col("text"), r"\b(the|a|of|and|or)\b")
    return d.select(
        "doc_id",
        F.md5(r["redacted"]).alias("redacted_md5"),
        r["n_redacted"].alias("n_redacted"),
    )


@register(
    "q_embed_quantize",
    oracle="""
    WITH x AS (SELECT vec_id,
                      list_transform(embedding, v -> CAST(v AS DOUBLE)) AS xs
               FROM embeddings),
    s AS (SELECT vec_id, xs,
                 sqrt(list_reduce(list_transform(xs, v -> v * v),
                                  (a, b) -> a + b)) AS nrm,
                 list_max(list_transform(xs, v -> abs(v))) AS mx
          FROM x),
    q AS (SELECT vec_id, nrm,
                 CASE WHEN mx = 0 THEN ''
                      ELSE array_to_string(
                             list_transform(xs,
                               v -> CAST(CAST(FLOOR(127.0 * v / mx) AS BIGINT)
                                         AS VARCHAR)), ',')
                 END AS qs
          FROM s)
    SELECT vec_id,
           CAST(FLOOR(1000000.0 * nrm) AS BIGINT) AS norm_e6,
           md5(qs) AS quant_md5
    FROM q
    """,
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding post-processing: L2 norm plus symmetric int8-style
    quantization (max-abs scale), digested for a narrow output. Pure
    array expressions over the scan — no shuffle; the float->double
    widening and IEEE +,*,/,sqrt chain is bit-identical on any engine."""
    e = load_table(spark, sf_dir, "embeddings")
    xs = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    nrm = F.sqrt(F.aggregate(F.transform(xs, lambda v: v * v), F.lit(0.0),
                             lambda a, b: a + b))
    mx = F.array_max(F.transform(xs, F.abs))
    qs = F.when(mx == 0, F.lit("")).otherwise(
        F.array_join(
            F.transform(
                xs,
                lambda v: F.floor(F.lit(127.0) * v / mx).cast("bigint").cast("string"),
            ),
            ",",
        )
    )
    return e.select(
        "vec_id",
        F.floor(F.lit(1e6) * nrm).cast("bigint").alias("norm_e6"),
        F.md5(qs).alias("quant_md5"),
    )


@register(
    "q_corpus_build",
    oracle=r"""
    WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
                 FROM documents),
    cnt AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY doc_id, t),
    top AS (SELECT doc_id, MAX(c) AS top_n, SUM(c) AS n_tok
            FROM cnt GROUP BY doc_id),
    stq AS (SELECT doc_id,
                   SUM(CASE WHEN t IN ('the','a','of','and','or')
                            THEN c ELSE 0 END) AS n_stop
            FROM cnt GROUP BY doc_id),
    fp AS (SELECT doc_id,
                  md5(regexp_replace(lower(text), '\s+', ' ', 'g'))
                    AS fingerprint
           FROM documents),
    adm AS (SELECT top.doc_id, top.n_tok, fp.fingerprint
            FROM top JOIN stq USING (doc_id) JOIN fp USING (doc_id)
            WHERE top.n_tok BETWEEN 5 AND 1000
              AND FLOOR(10000.0 * CAST(n_stop AS DOUBLE)
                        / CAST(top.n_tok AS DOUBLE)) >= 200
              AND FLOOR(10000.0 * CAST(top_n AS DOUBLE)
                        / CAST(top.n_tok AS DOUBLE)) < 5000),
    keep AS (SELECT MIN(doc_id) AS doc_id FROM adm GROUP BY fingerprint),
    kept AS (SELECT adm.doc_id, adm.n_tok
             FROM adm JOIN keep USING (doc_id)),
    tr AS (SELECT doc_id, n_tok FROM kept
           WHERE CAST(concat('0x',
                 substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                 % 100 < 90),
    sh AS (SELECT doc_id, n_tok,
                  CAST(concat('0x',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)) AS INT)
                       % 8 AS shard,
                  md5(CAST(doc_id AS VARCHAR)) AS hh
           FROM tr),
    c AS (SELECT doc_id, shard, n_tok,
                 SUM(n_tok) OVER (
                   PARTITION BY shard ORDER BY hh, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM sh)
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(n_tok AS BIGINT) AS n_tokens,
           CAST(cum - n_tok AS BIGINT) AS stream_start,
           CAST((cum - n_tok) // 256 AS BIGINT) AS seq_index,
           CAST((cum - n_tok) % 256 AS BIGINT) AS seq_offset
    FROM c
    """,
)
def q_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-side flagship composite — a full training-data build in
    one plan: quality gates (token window, stopword floor, top-token
    repetition cap) -> exact-dedup keepers -> deterministic 90% train
    split -> sharded concat-split sequence packing. Mirrors what
    q_chain_build is for the options side: every stage is an operator
    this package ships, composed and hash-checked end-to-end."""
    from oic_options_chains_spark.operators.sampling import split_assign
    from oic_options_chains_spark.operators.text import fingerprint

    d = load_table(spark, sf_dir, "documents")
    q = quality_metrics(F.col("text"))
    r = repetition_metrics(F.col("text"))
    scored = d.select(
        "doc_id",
        fingerprint(F.col("text")).alias("fingerprint"),
        q["n_tokens"].alias("n_tokens"),
        q["stop_ratio_bp"].alias("stop_ratio_bp"),
        r["top_token_bp"].alias("top_token_bp"),
    )
    admitted = scored.filter(
        F.col("n_tokens").between(5, 1000)
        & (F.col("stop_ratio_bp") >= 200)
        & (F.col("top_token_bp") < 5000)
    )
    # keeper selection as a window-min, not groupBy + semi-join back:
    # one corpus scan instead of two, so the interpreted quality/
    # repetition array lambdas run once per document (measured 1.7x
    # faster at sf0.1; at warehouse scale it also halves corpus IO).
    # Fingerprint partitions are duplicate-group-sized — no skew.
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint")
    kept = admitted.withColumn(
        "__keeper", F.min("doc_id").over(w)
    ).filter(F.col("doc_id") == F.col("__keeper"))
    train = kept.filter(split_assign(F.col("doc_id")) == "train")
    return pack_stream_offsets(
        train.select("doc_id", "n_tokens"), context=256, n_shards=8
    )


@register(
    "q_shuffle_shards",
    oracle="""
    WITH h AS (SELECT doc_id,
                      md5(CAST(doc_id AS VARCHAR)) AS hh,
                      CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                           AS INT) % 8 AS shard
               FROM documents)
    SELECT doc_id, CAST(shard AS INT) AS shard,
           CAST(row_number() OVER (PARTITION BY shard ORDER BY hh, doc_id)
                AS BIGINT) AS position
    FROM h
    """,
)
def q_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: content-hash (shard, position) for
    epoch-stable training order — one exchange + per-shard sort, no
    global sort bottleneck."""
    d = load_table(spark, sf_dir, "documents")
    return global_shuffle(d, "doc_id", n_shards=8).select(
        "doc_id", "shard", "position"
    )


@register(
    "q_span_dedup",
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
    rem AS (SELECT doc_id, unnest(range(s, e)) AS pos FROM spans),
    tok AS (SELECT doc_id, unnest(t) AS token,
                   unnest(range(0, len(t))) AS pos
            FROM toks),
    kept AS (
      SELECT k.doc_id, k.pos, k.token
      FROM tok k ANTI JOIN rem r ON k.doc_id = r.doc_id AND k.pos = r.pos),
    reb AS (
      SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS clean_text,
             CAST(COUNT(*) AS BIGINT) AS n_kept
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           COALESCE(r.clean_text, '') AS clean_text,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(len(t.t) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
    FROM toks t LEFT JOIN reb r ON t.doc_id = r.doc_id
    """,
)
def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span removal (operators/span_dedup.dedup_spans):
    every non-canonical repeated 8-token window is deleted and adjacent
    deletions merge — the substring-level dedup document-level LSH
    cannot express. All-relational: array-side fingerprints, one
    fingerprint-ranked window, gaps-and-islands span merge, co-
    partitioned anti-join, ordered rebuild."""
    from oic_options_chains_spark.operators.span_dedup import dedup_spans

    d = load_table(spark, sf_dir, "documents")
    return dedup_spans(d, n=8)


@register(
    "q_pack_boundaries",
    oracle="""
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                        AS n_tokens,
                      CAST(concat('0x',
                           substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                           AS INT) % 8 AS shard,
                      md5(CAST(doc_id AS VARCHAR)) AS hh
               FROM documents),
    c AS (SELECT doc_id, shard, n_tokens,
                 SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY hh, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS stream_start
          FROM t),
    e AS (SELECT doc_id, shard, stream_start, n_tokens,
                 unnest(range(CAST(stream_start // 256 AS BIGINT),
                              CAST((stream_start + n_tokens - 1) // 256 + 1
                                   AS BIGINT))) AS seq
          FROM c WHERE n_tokens > 0)
    SELECT CAST(shard AS INT) AS shard,
           CAST(seq AS BIGINT) AS seq_index,
           doc_id,
           CAST(GREATEST(stream_start, seq * 256) - seq * 256 AS BIGINT)
             AS seg_start,
           CAST(LEAST(stream_start + n_tokens, (seq + 1) * 256) - seq * 256
                AS BIGINT) AS seg_end
    FROM e
    """,
)
def q_pack_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sequence document-boundary manifest
    (operators/chunking.sequence_boundaries): each packed 256-token
    training sequence's internal document segments — where attention
    resets and loss masks split. One explode over the packer's offsets;
    row count is docs + sequences, never quadratic."""
    from oic_options_chains_spark.operators.chunking import sequence_boundaries

    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), " ")).cast("bigint").alias("n_tokens"),
    )
    return sequence_boundaries(sized, "doc_id", "n_tokens", context=256, n_shards=8)


@register(
    "q_interleave_media",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
    s AS (SELECT doc_id, t, len(t) AS n, (len(t) + 49) // 50 AS nsegs
          FROM toks),
    i AS (SELECT doc_id, t, n, nsegs, unnest(range(0, nsegs)) AS i FROM s),
    txt AS (SELECT doc_id, CAST(2 * i AS INT) AS seg_idx, 'text' AS kind,
                   array_to_string(t[i*50+1:least((i+1)*50, n)], ' ')
                     AS content,
                   CAST(least(50, n - i*50) AS BIGINT) AS n_tokens
            FROM i),
    img AS (SELECT doc_id, CAST(2 * i + 1 AS INT) AS seg_idx,
                   'image' AS kind,
                   'media:' || CAST((doc_id * 31 + i) % 1000 AS VARCHAR)
                     AS content,
                   CAST(1 AS BIGINT) AS n_tokens
            FROM i WHERE i < nsegs - 1)
    SELECT * FROM txt UNION ALL SELECT * FROM img
    """,
)
def q_interleave_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-language interleave (operators/chunking.
    interleave_media_segments): 50-token text segments with a media
    placeholder between consecutive segments — the LLaVA-style record
    shape a multimodal packer consumes, media refs resolved later
    against the manifest. Entirely row-local transform/flatten/explode;
    the only exchange in a real pipeline belongs to the downstream
    pack_sequences shard window."""
    from oic_options_chains_spark.operators.chunking import (
        interleave_media_segments,
    )

    d = load_table(spark, sf_dir, "documents")
    return interleave_media_segments(d, tokens_per_seg=50, media_mod=1000)


@register(
    "q_vl_build",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t
                  FROM documents),
    s AS (SELECT doc_id, t, len(t) AS n, (len(t) + 49) // 50 AS nsegs
          FROM toks),
    i AS (SELECT doc_id, t, n, nsegs, unnest(range(0, nsegs)) AS i FROM s),
    segs AS (
      SELECT doc_id, CAST(2 * i AS INT) AS seg_idx, 'text' AS kind,
             CAST(least(50, n - i*50) AS BIGINT) AS n_tokens
      FROM i
      UNION ALL
      SELECT doc_id, CAST(2 * i + 1 AS INT) AS seg_idx, 'image' AS kind,
             CAST(1 AS BIGINT) AS n_tokens
      FROM i WHERE i < nsegs - 1),
    sharded AS (
      SELECT *, CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                     AS INT) % 8 AS shard,
             md5(CAST(doc_id AS VARCHAR)) AS hh
      FROM segs),
    c AS (SELECT doc_id, seg_idx, kind, n_tokens, shard,
                 SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY hh, doc_id, seg_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
          FROM sharded)
    SELECT doc_id, seg_idx, kind, n_tokens, CAST(shard AS INT) AS shard,
           CAST(cum - n_tokens AS BIGINT) AS stream_start,
           CAST((cum - n_tokens) // 256 AS BIGINT) AS seq_index,
           CAST((cum - n_tokens) % 256 AS BIGINT) AS seq_offset
    FROM c
    """,
)
def q_vl_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vision-language corpus flagship: interleave_media_segments ->
    pack_grouped_stream_offsets in ONE plan — every text segment and
    media placeholder gets its shard, stream offset, and
    sequence-index/offset, with a document's segments contiguous in the
    packed stream (the multimodal invariant the flat packer can't
    give). Row-local interleave + one sharded cumsum exchange."""
    from oic_options_chains_spark.operators.chunking import (
        interleave_media_segments,
        pack_grouped_stream_offsets,
    )

    d = load_table(spark, sf_dir, "documents")
    segs = interleave_media_segments(d, tokens_per_seg=50, media_mod=1000)
    return pack_grouped_stream_offsets(
        segs.select("doc_id", "seg_idx", "kind", "n_tokens"),
        context=256,
        n_shards=8,
    )


@register(
    "q_pack_masks",
    oracle="""
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split(lower(text), ' ')) AS BIGINT)
                        AS n_tokens,
                      CAST(concat('0x',
                           substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                           AS INT) % 8 AS shard,
                      md5(CAST(doc_id AS VARCHAR)) AS hh
               FROM documents),
    c AS (SELECT doc_id, shard, n_tokens,
                 CAST(SUM(n_tokens) OVER (
                   PARTITION BY shard ORDER BY hh, doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS BIGINT) AS st
          FROM t),
    x AS (SELECT doc_id, shard, n_tokens, st,
                 unnest(range(st // 256, (st + n_tokens - 1) // 256 + 1))
                   AS q
          FROM c WHERE n_tokens > 0)
    SELECT CAST(shard AS INT) AS shard,
           CAST(q AS BIGINT) AS seq_index,
           doc_id,
           CAST(greatest(st, q * 256) - q * 256 AS BIGINT) AS begin_in_seq,
           CAST(least(st + n_tokens, (q + 1) * 256) - q * 256 AS BIGINT)
             AS end_in_seq
    FROM x
    """,
)
def q_pack_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document attention/loss-mask manifest
    (operators/chunking.pack_loss_masks): for every 256-token training
    sequence of the packed stream, which documents occupy which token
    ranges. Row-local explode over the packer's offsets — no exchange
    beyond the pack cumsum itself."""
    from oic_options_chains_spark.operators.chunking import (
        pack_loss_masks,
        pack_stream_offsets,
    )

    d = load_table(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id", token_count_ws(F.col("text")).alias("n_tokens")
    )
    packed = pack_stream_offsets(sized, key="doc_id", context=256, n_shards=8)
    return pack_loss_masks(packed, context=256)


@register(
    "q_span_corruption",
    oracle="""
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n
               FROM documents),
    st AS (SELECT doc_id, n, unnest(range(0, n)) AS i FROM t),
    sp AS (
      SELECT doc_id, n, CAST(i AS INT) AS start,
             CAST(least(i + 1 +
                   CAST(concat('0x',
                        substring(md5(doc_id || ':' || i || ':L'), 1, 13))
                        AS BIGINT) % 5, n) AS INT) AS e
      FROM st
      WHERE CAST(concat('0x',
                 substring(md5(doc_id || ':' || i || ':s'), 1, 13))
                 AS BIGINT) % 20 = 0),
    wprev AS (
      SELECT doc_id, n, start, e,
             MAX(e) OVER (PARTITION BY doc_id ORDER BY start, e
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_max
      FROM sp),
    isl AS (
      SELECT doc_id, n, start, e,
             SUM(CASE WHEN prev_max IS NULL OR start > prev_max
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY start, e
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS island
      FROM wprev),
    mg AS (SELECT doc_id, island, MIN(start) AS start,
                  MAX(e) - MIN(start) AS length, ANY_VALUE(n) AS n
           FROM isl GROUP BY doc_id, island)
    SELECT doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start) - 1
                AS INT) AS span_idx,
           CAST(start AS BIGINT) AS start,
           CAST(length AS BIGINT) AS length,
           CAST(n AS BIGINT) AS n_tokens
    FROM mg
    """,
)
def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic span-corruption manifest
    (operators/chunking.span_corruption_manifest): the token spans a
    T5/UL2 denoising objective masks per document, drawn by content
    hash (md5 of doc:position) so any engine, partitioning, or rerun
    reproduces them — overlapping draws merge gaps-and-islands style.
    Array-side start/length draws, one doc-keyed exchange."""
    from oic_options_chains_spark.operators.chunking import (
        span_corruption_manifest,
    )

    d = load_table(spark, sf_dir, "documents")
    return span_corruption_manifest(d, rate_denom=20, max_span=5)


@register(
    "q_linearize_orders",
    oracle="""
    WITH items AS (
      SELECT l_orderkey,
             string_agg('item ' || l_linenumber || ' part ' || l_partkey
                        || ' qty ' || CAST(l_quantity AS BIGINT),
                        '; ' ORDER BY l_linenumber, l_partkey,
                                       CAST(l_quantity AS BIGINT)) AS items_text,
             CAST(COUNT(*) AS BIGINT) AS n_items
      FROM lineitem GROUP BY l_orderkey),
    t AS (
      SELECT o.o_orderkey AS doc_key,
             'order ' || o.o_orderkey || ' by ' || c.c_name
             || ' segment ' || c.c_mktsegment
             || ' on ' || CAST(CAST(o.o_orderdate AS DATE) AS VARCHAR)
             || ' status ' || o.o_orderstatus
             || ' priority ' || o.o_orderpriority
             || ' total ' || CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
             || ' items ' || COALESCE(i.n_items, 0)
             || ': ' || COALESCE(i.items_text, 'none') AS text,
             COALESCE(i.n_items, 0) AS n_items
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      LEFT JOIN items i ON o.o_orderkey = i.l_orderkey)
    SELECT doc_key, text, CAST(n_items AS BIGINT) AS n_items,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
    FROM t
    """,
)
def q_linearize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational-to-corpus bridge (operators/linearize.linearize_orders):
    every order rendered as deterministic training text — customer,
    header fields, and line items in line-number order — with token
    counts ready for the packing tier. All numbers enter the string as
    BIGINTs or via the decimal(18,2)->varchar idiom, so the rendered
    document hashes identically on any engine."""
    from oic_options_chains_spark.operators.linearize import linearize_orders

    return linearize_orders(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "lineitem"),
    )


@register(
    "q_pack_compose",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS tk,
             CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS n,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))
                  AS INT) % 8 AS shard,
             md5(CAST(doc_id AS VARCHAR)) AS hh
      FROM documents),
    c AS (
      SELECT doc_id, tk, n, shard,
             CAST(SUM(n) OVER (PARTITION BY shard ORDER BY hh, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
                AS BIGINT) AS st
      FROM t),
    x AS (
      SELECT tk, n, shard, st,
             unnest(range(st // 256, (st + n - 1) // 256 + 1)) AS q
      FROM c WHERE n > 0),
    f AS (
      SELECT shard, CAST(q AS BIGINT) AS seq_index,
             greatest(st, q * 256) - q * 256 AS b,
             CAST(greatest(st, q * 256) - st AS BIGINT) AS ls,
             CAST(least(st + n, (q + 1) * 256) - greatest(st, q * 256)
                  AS BIGINT) AS ln,
             tk
      FROM x)
    SELECT CAST(shard AS INT) AS shard, seq_index,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ln) AS BIGINT) AS n_tokens,
           string_agg(
             array_to_string(tk[CAST(ls AS INT) + 1 : CAST(ls + ln AS INT)],
                             ' '),
             ' ' ORDER BY b) AS seq_text
    FROM f GROUP BY shard, seq_index
    """,
)
def q_pack_compose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized training rows (operators/chunking.
    compose_packed_sequences): every 256-token sequence of the packed
    stream assembled from its documents' token fragments — the
    end-to-end proof that stream offsets, sequence cuts, and span
    clipping agree (interior sequences compose to exactly 256 tokens).
    Fragment slicing is array-side; the final assembly groups are
    context-bounded, so no hot keys."""
    from oic_options_chains_spark.operators.chunking import (
        compose_packed_sequences,
    )

    d = load_table(spark, sf_dir, "documents")
    return compose_packed_sequences(d, context=256, n_shards=8)
