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

from oic_options_chains_spark.operators.chunking import chunk_documents
from oic_options_chains_spark.operators.decontam import contamination_counts
from oic_options_chains_spark.operators.ranking import bm25_components
from oic_options_chains_spark.operators.repetition import repetition_metrics
from oic_options_chains_spark.operators.sampling import global_shuffle
from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table


@register(
    "q_chunk_docs",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(lower(text), ' ') AS toks
               FROM documents),
    s AS (SELECT doc_id, toks, len(toks) AS n FROM t),
    st AS (SELECT doc_id, toks, n,
                  unnest(range(0, greatest(n, 1), 48)) AS start
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
    nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
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
