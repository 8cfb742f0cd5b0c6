"""DSIR-style importance-resampling data selection over hashed n-grams.

Data Selection via Importance Resampling (Xie et al. 2023): featurize
every document as a bag of hashed unigrams+bigrams, fit two smoothed
multinomial bucket distributions — the TARGET slice (the domain you
want more of) and the RAW corpus — and score each document by how much
more likely its grams are under the target distribution. Top scores are
the documents to keep. This is the standard pretraining data-selection
step between crawling and training, and it runs at any corpus size
because the model is just two B-bucket count vectors.

The reference engine has no selection operator; this extends the
training-data surface (SURVEY.md extensions) alongside the dedup and
mixture operators.

Integer-exact scoring (no logarithms, no floats — the BM25 rule from
operators/ranking.py): the paper scores log w(x) = Σ_g log(p_g / q_g).
libm's log differs by last-ulp across engines, so we rank by the MEAN
per-gram likelihood ratio instead, floor-scaled to an integer:

    ratio_sc[b] = floor( S * (c_tgt[b]+1) * (N_raw+B)
                         / ((c_raw[b]+1) * (N_tgt+B)) )      (add-1 smoothing)
    score(doc)  = floor( Σ_b t_b * ratio_sc[b] / Σ_b t_b )

computed entirely in decimal(38,0) multiply + integer division — both
engines produce the identical integer. The mean-ratio is a monotone
per-gram reweighting with the same "more target-like ⇒ larger" shape;
a consumer wanting the paper's log-sum form can apply log engine-locally
to the emitted per-bucket ratio table.

The target is a BOOLEAN COLUMN over the corpus relation (e.g.
``F.col("lang") == "en"``), not a second DataFrame: that lets BOTH
distributions come out of one B-row aggregate over one gram-count
relation — a conditional-sum grouping, the same single-pass trick as a
pivoted rollup. A physically separate target corpus (the paper's
Wikipedia case) unions in with the flag set true and is excluded from
the selection output by filtering the flag downstream.

Shuffle budget at 100 TB:

- gram counts: one explode + groupBy(doc, bucket) with map-side combine
  (at most B rows per doc survive the partial aggregate). This relation
  feeds both the model and the scoring; the two consumers share the
  identical exchange subtree (reusable), and nothing else touches the
  corpus text.
- the model is ONE B-row aggregate of that relation (c_raw and c_tgt as
  conditional sums), totals are a one-row aggregate of the B rows, and
  the ratio table BROADCASTS back onto the per-doc counts.
- selection is a sort-limit (TakeOrderedAndProject): per-partition
  top-k, k-sized merge — never a global sort.

Hash bucketing reuses ``operators/sampling.hash_bucket`` (md5-derived,
engine-portable, epoch-stable).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.sampling import hash_bucket

DSIR_BUCKETS = 256
DSIR_SCALE = 1 << 20


def _dec(c):
    return c.cast("decimal(38,0)")


def hashed_gram_counts(
    df: DataFrame,
    target: Column,
    n_buckets: int = DSIR_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, is_tgt, bucket, t): hashing-trick counts over unigrams AND
    word bigrams (the DSIR featurization), tagged with the target flag.
    Bigrams are built shuffle-free by zipping the token array against
    its own shift; the only exchange is the (doc, bucket) aggregation
    with map-side combine (is_tgt is constant per doc, so adding it to
    the key changes no cardinality)."""
    from oic_options_chains_spark.operators.text import bigram_strings, tokens

    grams = df.select(
        F.col(id_col),
        target.alias("is_tgt"),
        F.explode(
            F.concat(tokens(F.col(text_col)), bigram_strings(F.col(text_col)))
        ).alias("gram"),
    )
    return (
        grams.select(
            F.col(id_col),
            F.col("is_tgt"),
            hash_bucket(F.col("gram"), n_buckets).cast("int").alias("bucket"),
        )
        # bucket is never NULL (md5 of a non-null gram), so this filter
        # drops nothing — it exists so every consumer's subtree carries
        # the SAME isnotnull(bucket) constraint. Without it, the scoring
        # join in dsir_scores pushes isnotnull(bucket) into ITS copy of
        # this subtree only, the stats copy stays unfiltered, the two no
        # longer canonicalize equal, and the runtime never reuses the
        # gram-count shuffle stage: the corpus tokenize+explode ran once
        # per consumer (r15 before-plan: three full corpus passes in
        # q_dsir_select, zero ReusedExchange).
        .where(F.col("bucket").isNotNull())
        .groupBy(id_col, "is_tgt", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
    )


def bucket_stats(counts: DataFrame) -> DataFrame:
    """(bucket, c_raw, c_tgt) from tagged gram counts — one B-row
    conditional-sum aggregate. ADDITIVE (mergeable): stats over disjoint
    corpus slices sum bucket-wise to the stats of the union, which is
    what lets the streaming side (streaming/selection_stream.py)
    accumulate per-batch partials instead of reprocessing history."""
    return counts.groupBy("bucket").agg(
        F.sum("t").cast("bigint").alias("c_raw"),
        F.sum(F.when(F.col("is_tgt"), F.col("t")).otherwise(0))
        .cast("bigint")
        .alias("c_tgt"),
    )


def ratios_from_stats(stats: DataFrame, n_buckets: int = DSIR_BUCKETS, scale: int = DSIR_SCALE) -> DataFrame:
    """(bucket, c_raw, c_tgt, ratio_sc) from (bucket, c_raw, c_tgt) —
    the floor-scaled smoothed likelihood ratio, shared verbatim by the
    batch fit and the streaming model reader so the two can never
    drift."""
    # totals ride a whole-relation window over the B-row stats instead
    # of a separate agg + crossJoin: the agg form re-planned the entire
    # stats subtree (through the corpus gram counts) a second time just
    # to produce one row of sums, while the window computes them in the
    # same single-partition pass over the B rows stats already occupies.
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = F.lit(n_buckets)
    n_raw = F.sum("c_raw").over(w_all)
    n_tgt = F.sum("c_tgt").over(w_all)
    num = _dec(F.lit(scale)) * _dec(F.col("c_tgt") + 1) * _dec(n_raw + b)
    den = _dec(F.col("c_raw") + 1) * _dec(n_tgt + b)
    return (
        stats.select(
            "bucket", "c_raw", "c_tgt", num.alias("__num"), den.alias("__den")
        )
        .selectExpr(
            "bucket",
            "c_raw",
            "c_tgt",
            "CAST(__num div __den AS BIGINT) AS ratio_sc",
        )
    )


def dsir_bucket_ratios(
    df: DataFrame,
    target: Column,
    n_buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(bucket, c_raw, c_tgt, ratio_sc): the importance model itself —
    per-bucket raw/target gram counts and the floor-scaled smoothed
    likelihood ratio. B rows total; everything past the gram-count
    shuffle is aggregate-of-B-rows work."""
    counts = hashed_gram_counts(df, target, n_buckets, id_col, text_col)
    return ratios_from_stats(bucket_stats(counts), n_buckets, scale)


def dsir_scores(
    df: DataFrame,
    target: Column,
    n_buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_grams, dsir_score): every document's mean floor-scaled
    likelihood ratio under the target-vs-raw bucket model. The ratio
    table is broadcast; the corpus pays the shared gram-count shuffle
    plus one doc-keyed aggregation."""
    counts = hashed_gram_counts(df, target, n_buckets, id_col, text_col)
    ratios = ratios_from_stats(bucket_stats(counts), n_buckets, scale).select(
        "bucket", "ratio_sc"
    )
    scored = counts.join(F.broadcast(ratios), "bucket")
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("t").cast("bigint").alias("n_grams"),
            F.sum(_dec(F.col("t")) * _dec(F.col("ratio_sc"))).alias("__num"),
        )
        .selectExpr(
            id_col,
            "n_grams",
            "CAST(__num div n_grams AS BIGINT) AS dsir_score",
        )
    )


def dsir_select(
    df: DataFrame,
    target: Column,
    k: int,
    n_buckets: int = DSIR_BUCKETS,
    scale: int = DSIR_SCALE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k most target-like documents: (id, n_grams, dsir_score,
    rank), rank 1 = most target-like, ties to the lowest id. Sort-limit
    first (TakeOrderedAndProject), then rank only the k survivors — the
    single-partition stage touches k rows, never the corpus."""
    s = dsir_scores(df, target, n_buckets, scale, id_col, text_col)
    top = s.orderBy(F.desc("dsir_score"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("dsir_score"), F.asc(id_col))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
