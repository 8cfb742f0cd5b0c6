"""Frequent token co-occurrence (market-basket pairs) with a-priori
pruning — which informative terms travel together across a corpus. The
LLM-curation reading: topic signatures for mixture balancing, template
detection (boilerplate phrases co-occur near-deterministically), and
feature pairs for quality classifiers.

The naive form explodes: C(d, 2) pairs per document. Two classical
bounds make it linear-ish and are both DETERMINISTIC (so an oracle can
replay them exactly):

  1. a-priori prune — a pair can reach document-frequency ``min_pair``
     only if BOTH tokens do; joining the per-doc token set against the
     frequent vocabulary (df ≥ ``min_df`` ≥ ``min_pair``) first cuts the
     Zipf tail before any pairing. The frequent vocabulary is bounded by
     total_token_occurrences / min_df rows — the threshold, not the
     corpus, sizes it.
  2. rarest-first prefix cap — per document keep only the
     ``max_per_doc`` frequent tokens with the LOWEST document frequency
     (ties by token text), the same rarest-token-first ordering the
     PPJoin prefix filter uses (operators/setsim.py): rare tokens carry
     the signal, the ubiquitous ones only inflate pair counts.

Pairing then self-joins the capped per-doc relation on doc_id with
``t1 < t2`` — at most C(max_per_doc, 2) pairs per document, map-side
combinable into the final (t1, t2) count.

Every decision is integer or lexicographic: df counts, (df, token)
ordering, pair thresholds. No floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def doc_token_sets(
    df: DataFrame, id_col: str, text_col: str, min_token_len: int = 4
) -> DataFrame:
    """(id, token): distinct lowercase whitespace tokens of at least
    ``min_token_len`` chars per document — the basket relation."""
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), " "))
    return (
        df.select(F.col(id_col).alias("id"), F.explode(toks).alias("token"))
        .filter(F.length("token") >= min_token_len)
    )


def frequent_cooccurrence(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 25,
    max_per_doc: int = 20,
    min_pair: int = 10,
    min_token_len: int = 4,
) -> DataFrame:
    """(t1, t2, n_docs): token pairs (t1 < t2) co-occurring in at least
    ``min_pair`` documents, over the a-priori-pruned, rarest-first-capped
    basket relation. ``min_df`` must be ≥ ``min_pair`` for the prune to
    be lossless w.r.t. the capped semantics."""
    baskets = doc_token_sets(df, id_col, text_col, min_token_len)
    vocab = (
        baskets.groupBy("token")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df_cnt"))
        .filter(F.col("df_cnt") >= min_df)
    )
    # rarest-first prefix: per doc, the max_per_doc frequent tokens with
    # the smallest (df, token) — deterministic on both engines
    ranked = (
        baskets.join(vocab, "token")
        .withColumn(
            "__rk",
            F.row_number().over(
                Window.partitionBy("id").orderBy("df_cnt", "token")
            ),
        )
        .filter(F.col("__rk") <= max_per_doc)
        .select("id", "token")
    )
    left = ranked.select("id", F.col("token").alias("t1"))
    right = ranked.select("id", F.col("token").alias("t2"))
    return (
        left.join(right, "id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= min_pair)
    )
