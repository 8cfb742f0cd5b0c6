"""Tokenizer-prep operators: corpus vocabulary construction and
out-of-vocabulary rates.

The step between a cleaned corpus and training a tokenizer/model on it:
build the frequency-ranked vocabulary once (corpus-wide aggregation),
then score every document's OOV fraction against it — the signal used to
drop mis-languaged or binary-garbage documents that slipped the earlier
gates, and to size the tokenizer's vocab.

Scale notes: token counting is one corpus shuffle with map-side combine
(distinct (token) keys are vocabulary-sized, millions at most — tiny
next to the corpus). The rank window is a single-reducer sort over the
VOCABULARY, not the corpus; acceptable because vocabularies are bounded,
and documented here so nobody extends it to an unbounded key. OOV
scoring joins the exploded corpus against the vocab — broadcast-sized by
construction, so the corpus never reshuffles for it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token"),
    )


def token_vocab(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tf: int = 5,
) -> DataFrame:
    """Frequency-ranked vocabulary: (token, tf, df, vocab_id) for every
    token with corpus frequency >= ``min_tf``. vocab_id is 1-based in
    (tf desc, token asc) order — the id assignment a BPE-style trainer
    seeds from."""
    counts = (
        _tokens(df, id_col, text_col)
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.count_distinct(F.col(id_col)).alias("df"),
        )
        .filter(F.col("tf") >= min_tf)
    )
    w = Window.orderBy(F.col("tf").desc(), F.col("token").asc())
    return counts.select(
        "token",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("df").cast("bigint").alias("df"),
        F.row_number().over(w).cast("bigint").alias("vocab_id"),
    )


def oov_stats(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document OOV fraction vs a vocabulary: (id, n_tokens, n_oov,
    oov_bp). The vocab side is broadcast (bounded by construction); the
    corpus pays one explode + doc-keyed aggregation, no extra shuffle of
    the documents themselves."""
    toks = _tokens(df, id_col, text_col)
    hit = toks.join(
        F.broadcast(vocab.select(F.col("token"), F.lit(1).alias("__in"))),
        on="token",
        how="left",
    )
    return (
        hit.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("n_oov").cast("bigint").alias("n_oov"),
            F.floor(
                F.lit(10000.0)
                * F.col("n_oov").cast("double")
                / F.col("n_tokens").cast("double")
            )
            .cast("bigint")
            .alias("oov_bp"),
        )
    )


def feature_hashing(
    df: DataFrame,
    n_features: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, bucket, count): the hashing-trick sparse vectorizer — each
    token maps to ``md5 % n_features`` and per-document bucket counts
    form the fixed-width feature vector, with NO vocabulary pass at all
    (Weinberger et al. 2009): the property that lets featurization run
    in one streaming-compatible shot over any corpus size, at the cost
    of bucket collisions the dimensionality choice controls.

    One corpus shuffle on (doc, bucket) with map-side combine — at most
    ``n_features`` rows per document survive the partial aggregation.
    The sparse long form (absent buckets are zero) is the join-friendly
    representation; pivot to a dense array only at the consumer if its
    format demands it. md5-derived bucketing keeps the vector
    engine-portable and epoch-stable like every hash in this package."""
    from oic_options_chains_spark.operators.sampling import hash_bucket

    toks = _tokens(df, id_col, text_col)
    return (
        toks.select(
            F.col(id_col),
            hash_bucket(F.col("token"), n_features).cast("int").alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("count"))
    )
