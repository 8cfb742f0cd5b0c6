"""Data-selection t2 queries: DSIR-style importance resampling over the
documents corpus (operators/dsir.py).

Setup shared by both queries: RAW = all documents, TARGET = the English
documents (the domain being up-sampled). The DuckDB oracle rebuilds the
identical hashed unigram+bigram bucket model and the identical
floor-scaled integer ratios — no floats anywhere in the decision path,
so values match bit-for-bit (see the operator module docstring).

Output-type contract: HUGEINT intermediates are fine, but every output
column is CAST to BIGINT/INT (tests/test_oracle_types.py enforces it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.dsir import (
    DSIR_BUCKETS,
    DSIR_SCALE,
    dsir_bucket_ratios,
    dsir_select,
)
from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table

_TARGET_LANG = "en"
_TOP_K = 50

# Shared oracle prefix: per-doc hashed gram counts (t), the two bucket
# distributions, totals, and the floor-scaled smoothed ratio table.
_DSIR_CTE = f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token,
             unnest(range(0, len(string_split(lower(text), ' ')))) AS pos
      FROM documents),
    grams AS (
      SELECT doc_id, token AS gram FROM tok
      UNION ALL
      SELECT a.doc_id, a.token || ' ' || b.token AS gram
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    t AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(md5(gram), 1, 4)) AS INT)
                  % {DSIR_BUCKETS} AS INT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS t
      FROM grams GROUP BY 1, 2),
    raw_c AS (SELECT bucket, CAST(SUM(t) AS BIGINT) AS c_raw
              FROM t GROUP BY 1),
    tgt_c AS (SELECT t.bucket, CAST(SUM(t.t) AS BIGINT) AS c_tgt
              FROM t JOIN documents d ON t.doc_id = d.doc_id
              WHERE d.lang = '{_TARGET_LANG}' GROUP BY 1),
    stats AS (
      SELECT r.bucket, r.c_raw,
             CAST(COALESCE(g.c_tgt, 0) AS BIGINT) AS c_tgt
      FROM raw_c r LEFT JOIN tgt_c g ON r.bucket = g.bucket),
    tot AS (SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
                   CAST(SUM(c_tgt) AS BIGINT) AS n_tgt FROM stats),
    ratios AS (
      SELECT bucket, c_raw, c_tgt,
             CAST((CAST({DSIR_SCALE} AS HUGEINT) * (c_tgt + 1)
                   * (n_raw + {DSIR_BUCKETS}))
                  // (CAST(c_raw + 1 AS HUGEINT) * (n_tgt + {DSIR_BUCKETS}))
                  AS BIGINT) AS ratio_sc
      FROM stats CROSS JOIN tot)
"""


@register(
    "q_dsir_ratios",
    oracle=f"""
    {_DSIR_CTE}
    SELECT bucket, c_raw, c_tgt, ratio_sc FROM ratios
    """,
)
def q_dsir_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DSIR importance model itself: per-bucket raw/target hashed
    unigram+bigram counts and the floor-scaled smoothed likelihood
    ratio (Xie et al. 2023). B=256 rows — the entire model a 100 TB
    selection run broadcasts; everything corpus-sized stays in the two
    gram-count shuffles."""
    d = load_table(spark, sf_dir, "documents")
    return dsir_bucket_ratios(d, F.col("lang") == _TARGET_LANG)


@register(
    "q_dsir_select",
    oracle=f"""
    {_DSIR_CTE},
    scored AS (
      SELECT t.doc_id, CAST(SUM(t.t) AS BIGINT) AS n_grams,
             SUM(CAST(t.t AS HUGEINT) * r.ratio_sc) AS num
      FROM t JOIN ratios r ON t.bucket = r.bucket GROUP BY 1),
    final AS (
      SELECT doc_id, n_grams, CAST(num // n_grams AS BIGINT) AS dsir_score
      FROM scored)
    SELECT doc_id, n_grams, dsir_score, CAST(rank AS INT) AS rank FROM (
      SELECT doc_id, n_grams, dsir_score,
             row_number() OVER (ORDER BY dsir_score DESC, doc_id) AS rank
      FROM final)
    WHERE rank <= {_TOP_K}
    """,
)
def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection: the 50 documents whose hashed-gram distribution
    is most English-target-like under the mean-likelihood-ratio score.
    Ratio table broadcast onto per-doc counts, one doc-keyed aggregate,
    then a sort-limit — the data-selection pass a pretraining pipeline
    runs between crawl and tokenize."""
    d = load_table(spark, sf_dir, "documents")
    return dsir_select(d, F.col("lang") == _TARGET_LANG, k=_TOP_K)


@register(
    "q_temperature_mix",
    oracle="""
    WITH sizes AS (
      SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM documents GROUP BY 1),
    s AS (SELECT lang, n, n_rows, sqrt(CAST(n AS DOUBLE)) AS s FROM sizes),
    -- the fold over the lang-sorted list pins the double addition
    -- order (matches the Spark-side sorted-array left fold)
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
                   list_reduce(list(s ORDER BY lang), (a, b) -> a + b) AS ts
            FROM s)
    SELECT lang, n, n_rows,
           CAST(10000 * n // tn AS BIGINT) AS nat_bp,
           CAST(FLOOR(10000.0 * s / ts) AS BIGINT) AS weight_bp
    FROM s CROSS JOIN tot
    """,
)
def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture weights (mT5/XLM-R alpha-sampling, alpha=0.5)
    per language, sized by characters: natural share vs temperature
    share in basis points. sqrt is IEEE-correctly-rounded (unlike pow),
    and the share denominator folds over the lang-sorted array, so both
    engines produce the identical doubles and identical floors — the
    derived weights feed ``mixture_sample`` as its static table."""
    from oic_options_chains_spark.operators.sampling import temperature_weights

    d = load_table(spark, sf_dir, "documents")
    return temperature_weights(d, "lang", alpha_quarters=2, size_col="n_chars")


_LM_GATE = 35500  # scaled mean bigram probability; ~ the 30th pctile


@register(
    "q_selection_build",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token,
             unnest(range(0, len(string_split(lower(text), ' ')))) AS pos
      FROM documents),
    dp AS (
      SELECT a.doc_id, a.token AS w1, b.token AS w2
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
           FROM dp GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM c1),
    lmodel AS (
      SELECT c2.w1, c2.w2,
             CAST((CAST(c2 + 1 AS HUGEINT) * 1048576)
                  // CAST(c1 + v AS HUGEINT) AS BIGINT) AS p_sc
      FROM c2 JOIN c1 ON c2.w1 = c1.w1 CROSS JOIN v),
    lms AS (
      SELECT dp.doc_id,
             CAST(SUM(CAST(p_sc AS HUGEINT))
                  // COUNT(*) AS BIGINT) AS lm_score
      FROM dp JOIN lmodel ON dp.w1 = lmodel.w1 AND dp.w2 = lmodel.w2
      GROUP BY 1),
    surv AS (
      SELECT d.doc_id, d.lang, d.source, l.lm_score
      FROM documents d JOIN lms l ON d.doc_id = l.doc_id
      WHERE l.lm_score >= {_LM_GATE}),
    sgrams AS (
      SELECT t.doc_id, t.token AS gram FROM tok t
      JOIN surv s ON t.doc_id = s.doc_id
      UNION ALL
      SELECT a.doc_id, a.token || ' ' || b.token AS gram
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      JOIN surv s ON a.doc_id = s.doc_id),
    st AS (
      SELECT doc_id,
             CAST(CAST(concat('0x', substr(md5(gram), 1, 4)) AS INT)
                  % {DSIR_BUCKETS} AS INT) AS bucket,
             CAST(COUNT(*) AS BIGINT) AS t
      FROM sgrams GROUP BY 1, 2),
    raw_c AS (SELECT bucket, CAST(SUM(t) AS BIGINT) AS c_raw
              FROM st GROUP BY 1),
    tgt_c AS (SELECT st.bucket, CAST(SUM(st.t) AS BIGINT) AS c_tgt
              FROM st JOIN surv s ON st.doc_id = s.doc_id
              WHERE s.lang = '{_TARGET_LANG}' GROUP BY 1),
    stats AS (
      SELECT r.bucket, r.c_raw,
             CAST(COALESCE(g.c_tgt, 0) AS BIGINT) AS c_tgt
      FROM raw_c r LEFT JOIN tgt_c g ON r.bucket = g.bucket),
    tot AS (SELECT CAST(SUM(c_raw) AS BIGINT) AS n_raw,
                   CAST(SUM(c_tgt) AS BIGINT) AS n_tgt FROM stats),
    ratios AS (
      SELECT bucket,
             CAST((CAST({DSIR_SCALE} AS HUGEINT) * (c_tgt + 1)
                   * (n_raw + {DSIR_BUCKETS}))
                  // (CAST(c_raw + 1 AS HUGEINT) * (n_tgt + {DSIR_BUCKETS}))
                  AS BIGINT) AS ratio_sc
      FROM stats CROSS JOIN tot),
    dscored AS (
      SELECT st.doc_id,
             CAST(SUM(CAST(st.t AS HUGEINT) * r.ratio_sc)
                  // SUM(st.t) AS BIGINT) AS dsir_score
      FROM st JOIN ratios r ON st.bucket = r.bucket GROUP BY 1),
    ranked AS (
      SELECT s.doc_id, s.lang, s.source, s.lm_score, d.dsir_score,
             row_number() OVER (ORDER BY d.dsir_score DESC, s.doc_id) AS rank
      FROM surv s JOIN dscored d ON s.doc_id = d.doc_id)
    SELECT doc_id, lang, source, lm_score, dsir_score,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {_TOP_K}
    """,
)
def q_selection_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-5 composed flagship — the data-selection pass end to end:
    (1) gate documents on the corpus-trained LM quality score (CCNet
    perplexity-bucket analog, operators/lm.lm_quality_scores), then
    (2) DSIR-select the 50 most English-target-like survivors
    (operators/dsir.dsir_select), carrying lang/source/both scores for
    the mixture report downstream. One registry entry exercises the two
    models COMPOSED — gate feeding selection — with a single oracle
    hash across the whole pipeline."""
    from oic_options_chains_spark.operators.lm import lm_quality_scores

    d = load_table(spark, sf_dir, "documents")
    lm = lm_quality_scores(d).filter(F.col("lm_score") >= _LM_GATE)
    # materialization barrier: `surv` is consumed three times downstream
    # (DSIR gram counts feed BOTH the ratio model and the scoring join,
    # plus the final carry-columns join) and the branches' physical
    # subtrees diverge enough that exchange reuse never fires — without
    # the barrier the whole corpus-wide LM pass re-runs per consumer.
    # Harmless on a gate that keeps few docs; on a corpus the gate DOESN'T
    # prune (the Zipf template twin scores every doc fluent: 100k/100k
    # survivors) the recompute tripled the query (zipf2 81 s -> 27 s).
    # At warehouse scale this is the curated intermediate a pipeline
    # persists anyway.
    surv = d.join(lm.select("doc_id", "lm_score"), "doc_id").localCheckpoint(
        eager=True
    )
    sel = dsir_select(surv, F.col("lang") == _TARGET_LANG, k=_TOP_K)
    return sel.join(
        surv.select("doc_id", "lang", "source", "lm_score"), "doc_id"
    ).select("doc_id", "lang", "source", "lm_score", "dsir_score", "rank")


@register(
    "q_fertility",
    oracle="""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(strlen(text)) AS BIGINT) AS n_bytes,
           CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
                AS BIGINT) AS n_tokens,
           CAST((1000 * SUM(strlen(text)))
                // SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
                AS BIGINT) AS bytes_per_token_e3
    FROM documents GROUP BY lang
    """,
)
def q_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: bytes per regex word-piece
    token, 1000x-scaled integer — the curation metric that flags
    languages a tokenizer fragments (high bytes/token = the slice is
    over-paying sequence length for its information). Row-local token
    counting (shuffle-free map side), one languages-sized aggregate,
    integer division — exact on both engines."""
    from oic_options_chains_spark.operators.text import token_count_re

    d = load_table(spark, sf_dir, "documents")
    per = d.select(
        "lang",
        F.octet_length("text").cast("bigint").alias("__b"),
        token_count_re(F.col("text")).alias("__t"),
    )
    return (
        per.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__b").cast("bigint").alias("n_bytes"),
            F.sum("__t").cast("bigint").alias("n_tokens"),
        )
        .selectExpr(
            "lang",
            "n_docs",
            "n_bytes",
            "n_tokens",
            "CAST(1000 * n_bytes div n_tokens AS BIGINT) AS bytes_per_token_e3",
        )
    )


_MIX_BUDGET = 1_000_000  # planned corpus size, tokens


@register(
    "q_mixture_plan",
    oracle=f"""
    WITH sizes AS (
      SELECT lang,
             CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
                  AS BIGINT) AS n_avail,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY lang),
    s AS (SELECT lang, n_avail, n_chars,
                 sqrt(CAST(n_chars AS DOUBLE)) AS s FROM sizes),
    tot AS (SELECT list_reduce(list(s ORDER BY lang), (a, b) -> a + b) AS ts
            FROM s),
    w AS (SELECT lang, n_avail,
                 CAST(FLOOR(10000.0 * s / ts) AS BIGINT) AS weight_bp
          FROM s CROSS JOIN tot)
    SELECT lang, n_avail, weight_bp,
           CAST(weight_bp * {_MIX_BUDGET} // 10000 AS BIGINT) AS token_budget,
           CAST(LEAST(weight_bp * {_MIX_BUDGET} // 10000, n_avail)
                AS BIGINT) AS planned_tokens,
           CAST(CASE WHEN weight_bp * {_MIX_BUDGET} // 10000 > n_avail
                THEN 1 ELSE 0 END AS INT) AS short
    FROM w
    """,
)
def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mixture PLAN a curation run executes: temperature shares
    (alpha=0.5, character-sized) converted to per-language token budgets
    against a fixed total, clamped by what each language can actually
    supply — with a ``short`` flag where the budget exceeds availability
    (the signal to re-run with a lower temperature or accept repetition).
    Composes q_temperature_mix's weights with q_fertility's token
    counting; all integer division on groups-sized relations."""
    from oic_options_chains_spark.operators.sampling import temperature_weights
    from oic_options_chains_spark.operators.text import token_count_re

    d = load_table(spark, sf_dir, "documents")
    avail = d.groupBy("lang").agg(
        F.sum(token_count_re(F.col("text"))).cast("bigint").alias("n_avail")
    )
    w = temperature_weights(d, "lang", alpha_quarters=2, size_col="n_chars")
    # null-SAFE join: both sides group by lang, and a NULL-lang slice is
    # a legitimate group the oracle (GROUP BY, no lang join) would keep —
    # a plain inner join would silently drop it (NULL != NULL)
    return (
        w.select("lang", "weight_bp")
        .join(avail.withColumnRenamed("lang", "__lang"),
              F.col("lang").eqNullSafe(F.col("__lang")))
        .drop("__lang")
        .selectExpr(
            "lang",
            "n_avail",
            "weight_bp",
            f"CAST(weight_bp * {_MIX_BUDGET} div 10000 AS BIGINT) AS token_budget",
            f"CAST(LEAST(weight_bp * {_MIX_BUDGET} div 10000, n_avail) AS BIGINT)"
            " AS planned_tokens",
            f"CAST(CASE WHEN weight_bp * {_MIX_BUDGET} div 10000 > n_avail"
            " THEN 1 ELSE 0 END AS INT) AS short",
        )
    )
