"""Exact set-similarity join via prefix filtering (AllPairs/PPJoin
family, Bayardo et al. WWW'07; Xiao et al. PPJoin).

MinHash-LSH (``operators/minhash.py``) finds near-duplicates
PROBABILISTICALLY — band collisions can miss a qualifying pair. The
prefix filter is the EXACT counterpart: order every document's element
set by ascending global document frequency (rarest first) and index only
the first ``p = n - ceil(t*n) + 1`` elements. Two sets with Jaccard >= t
must share at least one prefix element (if they shared none, the overlap
is bounded by min(n_a, n_b) - p < t * max(n_a, n_b)), so the candidate
set is COMPLETE; an exact integer verification then removes false
positives. No sketch, no probability of a miss.

Candidate pruning (both filters preserve completeness):

- LENGTH filter: Jaccard >= t forces ``t * max(n_a, n_b) <= min(n_a,
  n_b)`` — checked in the index join as an integer cross-multiplication.
- POSITIONAL filter (PPJoin): ranks come from ONE global total order
  (df ASC, element ASC), so two documents list their shared elements in
  the same relative order. For the FIRST shared element (positions
  rn_a, rn_b) every other shared element sits after it in BOTH sets,
  hence ``overlap <= 1 + min(n_a - rn_a, n_b - rn_b)``; an index hit
  whose bound cannot reach the minimum qualifying overlap
  ``ceil(t/(1+t) * (n_a + n_b))`` is dropped. A qualifying pair always
  survives via its first shared element, so completeness holds.

Verification joins the surviving pairs to per-document sorted element
ARRAYS (two id-keyed equi-joins, candidate-bounded) and counts the exact
intersection with ``array_intersect`` — never the pair x element
row explosion of a three-way join through the full element relation.

SET REPRESENTATION matters more than any filter: over unigram tokens a
small vocabulary makes most documents near-identical as sets (Jaccard
quantifies vocabulary overlap, not content overlap) and the output
itself goes quadratic. The corpus entry point is therefore n-gram
SHINGLE sets (``q_prefix_join`` uses 3-token shingles, the same
representation as the MinHash/Jaccard dedup family), whose combinatorial
space keeps both the prefix index and the qualifying-pair set sparse.

Every decision is integer (df ranks, prefix lengths, the
cross-multiplied Jaccard and filter tests), so any two engines produce
the identical pair set.
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


def _ranked_tokens(tok: DataFrame, broadcast_df: bool = False) -> DataFrame:
    """(doc_id, term, n, rn): every element with its set size and its
    global-rarity rank within the document.

    Element order is (df ASC, term ASC): a TOTAL deterministic order, so
    ranks are identical on every engine. ``broadcast_df=False``
    (default) joins the df relation by shuffle: over shingle sets the
    element vocabulary is corpus-sized and must never be broadcast;
    unigram callers with a genuinely small vocabulary may opt in. The
    per-document rank window is hash-partitioned by doc_id and each
    partition holds one document's elements — never corpus-scaled."""
    df_counts = tok.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("__df"))
    if broadcast_df:
        df_counts = F.broadcast(df_counts)
    with_df = tok.join(df_counts, "term")
    w_n = Window.partitionBy("doc_id")
    w_rank = Window.partitionBy("doc_id").orderBy(
        F.col("__df").asc(), F.col("term").asc()
    )
    return (
        with_df.withColumn("n", F.count(F.lit(1)).over(w_n).cast("bigint"))
        .withColumn("rn", F.row_number().over(w_rank).cast("bigint"))
        .select("doc_id", "term", "n", "rn")
    )


def _prefix_filter(ranked: DataFrame, t_pct: int) -> DataFrame:
    """Keep each document's prefix under threshold t = t_pct/100 — its
    ``n - ceil(t*n) + 1`` globally-rarest elements. ceil(t*n) is the
    integer ``(t_pct*n + 99) div 100``; no float touches the prefix
    length."""
    return ranked.filter(F.expr(f"rn <= n - (({t_pct} * n + 99) div 100) + 1"))


def prefix_tokens(
    tok: DataFrame, t_pct: int, broadcast_df: bool = False
) -> DataFrame:
    """(doc_id, term, n, rn): each document's prefix under threshold
    t = t_pct/100, with the global rank ``rn`` kept for the positional
    filter (see ``_ranked_tokens`` for the ordering contract)."""
    return _prefix_filter(_ranked_tokens(tok, broadcast_df), t_pct)


def prefix_join_sets(
    sets: DataFrame, t_pct: int = 50, broadcast_df: bool = False
) -> DataFrame:
    """All pairs of a (doc_id, term) SET relation with Jaccard >=
    t_pct/100 — EXACT, via prefix filtering. Returns (doc_a, doc_b,
    inter_n, union_n, jaccard_e6) with doc_a < doc_b and jaccard_e6 =
    floor(1e6 * inter / union) as a pure integer division.

    Three stages, all bucket- or candidate-bounded:
    1. prefix inverted index (rarest ``n - ceil(t*n) + 1`` elements/doc,
       global ranks kept);
    2. candidate pairs = prefix equi-self-join (doc_a < doc_b) pruned by
       the integer length and positional filters, then distinct —
       complete for Jaccard >= t by the prefix property;
    3. verification joins candidates to per-document sorted element
       arrays and keeps pairs with ``100 * inter >= t_pct * (n_a + n_b
       - inter)`` — the Jaccard test cross-multiplied into integers, so
       no engine can disagree on a boundary pair. The collect_list is
       bounded by ONE document's element count, the same contract as
       the span-dedup window.

    The verification arrays are built from the raw SET relation, not
    the ranked one: ranks and document frequencies play no part in the
    exact intersection, and the ranked subtree (df join + two windows
    over the full element relation) is corpus-expensive — reading it
    for the arrays re-ran that pipeline once per array side (the two
    sides share one groupBy(doc_id) exchange via runtime stage reuse;
    the r15 before-plan shows four full ranked copies).
    """
    ranked = _ranked_tokens(sets, broadcast_df=broadcast_df)
    pref = _prefix_filter(ranked, t_pct)
    a, b = pref.alias("a"), pref.alias("b")
    # positional bound: overlap <= 1 + min(remaining suffix lengths);
    # qualifying overlap o satisfies (100 + t_pct) * o >= t_pct * (n_a + n_b)
    ubound = F.lit(1) + F.least(
        F.col("a.n") - F.col("a.rn"), F.col("b.n") - F.col("b.rn")
    )
    cand = (
        a.join(b, on="term")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(
            F.lit(t_pct) * F.greatest(F.col("a.n"), F.col("b.n"))
            <= F.lit(100) * F.least(F.col("a.n"), F.col("b.n"))
        )
        .filter(
            ubound * F.lit(100 + t_pct) >= F.lit(t_pct) * (F.col("a.n") + F.col("b.n"))
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    arrays = sets.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("term")).alias("__terms"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    inter = (
        cand.join(
            arrays.select(
                F.col("doc_id").alias("doc_a"),
                F.col("__terms").alias("__ta"),
                F.col("n").alias("n_a"),
            ),
            "doc_a",
        )
        .join(
            arrays.select(
                F.col("doc_id").alias("doc_b"),
                F.col("__terms").alias("__tb"),
                F.col("n").alias("n_b"),
            ),
            "doc_b",
        )
        .withColumn(
            "inter_n", F.size(F.array_intersect("__ta", "__tb")).cast("bigint")
        )
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


def prefix_similarity_join(
    docs: DataFrame,
    t_pct: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All pairs with unigram token-set Jaccard >= t_pct/100 — the
    text-column entry point over whitespace-token sets (vocabulary small
    enough that the df relation broadcasts). For corpus dedup use
    shingle sets (``minhash.doc_shingles`` -> ``prefix_join_sets``):
    unigram Jaccard over a small vocabulary saturates and the qualifying
    pair set itself goes quadratic."""
    return prefix_join_sets(
        doc_token_sets(docs, id_col, text_col), t_pct, broadcast_df=True
    )
