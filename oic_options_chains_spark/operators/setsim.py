"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin
family, Bayardo et al. WWW'07; Xiao et al. PPJoin).

MinHash-LSH (``operators/minhash.py``) finds near-duplicates
PROBABILISTICALLY — band collisions can miss a qualifying pair. The
prefix filter is the EXACT counterpart: order every document's token set
by ascending global document frequency (rarest first) and index only the
first ``p = n - ceil(t*n) + 1`` tokens. Two sets with Jaccard >= t must
share at least one prefix token (if they shared none, the overlap is
bounded by min(n_a, n_b) - p < t * max(n_a, n_b)), so the candidate set
is COMPLETE; an exact integer verification then removes false positives.
No sketch, no probability of a miss.

Scale: the inverted index is built only over prefix tokens, which are by
construction each document's RAREST tokens — the candidate join's bucket
sizes follow the df of the rare tail, not the Zipf head, so the
quadratic-in-bucket blowup that forces a df cap on the full-index
n-gram join (``minhash.py`` capped variant) never materializes. Work is
one corpus shuffle to tokenize + rank, one equi-join on prefix tokens,
and a candidate-bounded verification join. Every decision is integer
(df ranks, prefix lengths, the cross-multiplied Jaccard test), so any
two engines produce the identical pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.text import tokens


def doc_token_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, term): each document's DISTINCT whitespace tokens — the
    set semantics the Jaccard test is defined over."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), tokens(F.col(text_col)).alias("__t"))
        .select("doc_id", F.explode("__t").alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )


def prefix_tokens(tok: DataFrame, t_pct: int) -> DataFrame:
    """(doc_id, term, n): each document's prefix under threshold
    t = t_pct/100 — its ``n - ceil(t*n) + 1`` globally-rarest tokens.

    Token order is (df ASC, term ASC): a TOTAL deterministic order, so
    the prefix is identical on every engine. ceil(t*n) is the integer
    ``(t_pct*n + 99) div 100``; no float touches the prefix length. The
    df relation is vocabulary-sized and broadcast back onto the corpus.
    The per-document rank window is hash-partitioned by doc_id and each
    partition holds one document's tokens — never corpus-scaled."""
    df_counts = tok.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("__df"))
    with_df = tok.join(F.broadcast(df_counts), "term")
    w_n = Window.partitionBy("doc_id")
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("__df").asc(), F.col("term").asc()
    )
    return (
        with_df.withColumn("n", F.count(F.lit(1)).over(w_n).cast("bigint"))
        .withColumn("__rn", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.expr(f"__rn <= n - (({t_pct} * n + 99) div 100) + 1"))
        .select("doc_id", "term", "n")
    )


def prefix_similarity_join(
    docs: DataFrame,
    t_pct: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs with token-set Jaccard >= t_pct/100 — EXACT, via prefix
    filtering. Returns (doc_a, doc_b, inter_n, union_n, jaccard_e6) with
    doc_a < doc_b and jaccard_e6 = floor(1e6 * inter / union) computed
    as a pure integer division.

    Three stages, all bucket- or candidate-bounded:
    1. prefix inverted index (rarest ``n - ceil(t*n) + 1`` tokens/doc);
    2. candidate pairs = prefix-token equi-self-join (doc_a < doc_b),
       distinct — complete for Jaccard >= t by the prefix property;
    3. verification join against the full token sets counts the exact
       intersection, then keeps pairs with
       ``100 * inter >= t_pct * (n_a + n_b - inter)`` — the Jaccard
       test cross-multiplied into integers, so no engine can disagree
       on a boundary pair.
    """
    tok = doc_token_sets(docs, id_col, text_col)
    pref = prefix_tokens(tok, t_pct)
    cand = (
        pref.alias("a")
        .join(pref.alias("b"), on="term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
        )
        .distinct()
    )
    ta = tok.select(F.col("doc_id").alias("doc_a"), "term")
    tb = tok.select(F.col("doc_id").alias("doc_b"), "term")
    inter = (
        cand.join(ta, "doc_a")
        .join(tb, ["doc_b", "term"])
        .groupBy("doc_a", "doc_b", "n_a", "n_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter_n"))
    )
    return (
        inter.filter(
            F.lit(100) * F.col("inter_n")
            >= F.lit(t_pct) * (F.col("n_a") + F.col("n_b") - F.col("inter_n"))
        )
        .select(
            "doc_a",
            "doc_b",
            "inter_n",
            (F.col("n_a") + F.col("n_b") - F.col("inter_n")).alias("union_n"),
            F.expr("CAST(1000000 * inter_n AS BIGINT) div (n_a + n_b - inter_n)").alias(
                "jaccard_e6"
            ),
        )
    )
