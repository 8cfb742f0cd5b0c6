"""Exact duplicated-SPAN removal: delete every token run that repeats
elsewhere in the corpus, keeping one canonical copy — the substring-level
dedup step (Lee et al. 2021, "Deduplicating Training Data Makes Language
Models Better") that document-level dedup (minhash.py) cannot do:
boilerplate headers, license blocks, and quoted chunks that recur inside
otherwise-unique documents.

Semantics: an n-token window is DUPLICATED if its token sequence occurs
at more than one (doc, position). The first occurrence in (doc_id,
start) order is canonical and stays; every other occurrence's token span
is removed. Overlapping and adjacent removed spans merge (gaps-and-
islands), so a long repeated region is deleted as one block, and the
surviving tokens are re-joined in order.

Plan shape at 100 TB — all relational, no UDF:
- window fingerprints build ARRAY-SIDE per document (transform over the
  token array), so the only corpus-sized exchanges are: (1) the
  fingerprint window that ranks occurrences (hash-partitioned on the
  fingerprint; a Zipf-hot fingerprint serializes one partition's linear
  scan, but rank>1 filtering streams — nothing materializes per group),
  and (2) one doc-keyed join of the base against the per-document
  merged-span arrays.
- The island-merge windows and the span collect_list run over FLAGGED
  occurrences only (duplicates), not the corpus; the rebuild splices
  the token array between spans with aggregate()+slice() entirely
  array-side — no per-token explode, no (doc, pos) anti-join, no
  collect_list re-sort of the whole corpus.

Reference scope: extends K1/K2's row-identity dedup
(transform-load.2025-08-19.rkt ON CONFLICT DO NOTHING) to sub-row
content identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_spans(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_occurrences: int | None = None,
) -> DataFrame:
    """(id, clean_text, n_tokens, n_kept, n_removed) with every
    non-canonical duplicated n-token span deleted. Documents shorter
    than ``n`` tokens pass through whole; a fully-duplicated document
    comes back with ``clean_text = ''``.

    ``max_occurrences`` is the hot-fingerprint escape hatch (the DF-cap
    pattern from ``ngram_jaccard_pairs_capped``): a window occurring in
    more than this many places is EXCLUDED from span removal — such
    ultra-frequent spans are corpus boilerplate, the job of the
    corpus-global boilerplate gate (operators/text via q_boilerplate),
    and ranking millions of occurrences of one fingerprint would
    serialize a single window partition. Default None keeps exact
    semantics (every duplicate removed); set it when a corpus has
    mega-duplicated spans."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    base = df.select(F.col(id_col), toks.alias("__t"))

    # Window fingerprints, built array-side: start i covers tokens
    # [i, i+n). sequence() is guarded — with stop < start it would
    # generate a DESCENDING range, not an empty one.
    starts = F.when(
        F.size("__t") >= n, F.sequence(F.lit(0), F.size("__t") - n)
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                starts,
                lambda i: F.md5(F.concat_ws(" ", F.slice("__t", i + 1, n))),
            )
        ).alias("start", "fp"),
    )

    # Canonical occurrence = rank 1 in (doc, start) order per
    # fingerprint; every later occurrence is a span to remove. The
    # occurrence count rides the same window pass (no second shuffle)
    # when the hot-fingerprint cap is on.
    w_fp = Window.partitionBy("fp").orderBy(F.col(id_col).asc(), F.col("start").asc())
    ranked = grams.withColumn("__rn", F.row_number().over(w_fp))
    if max_occurrences is not None:
        w_cnt = Window.partitionBy("fp")
        ranked = ranked.withColumn("__f", F.count(F.lit(1)).over(w_cnt)).filter(
            F.col("__f") <= max_occurrences
        )
    flagged = ranked.filter(F.col("__rn") > 1).select(
        F.col(id_col), F.col("start"), (F.col("start") + n).alias("end")
    )

    # Gaps-and-islands merge of overlapping/adjacent spans per document.
    w_prev = (
        Window.partitionBy(id_col)
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(id_col)
        .orderBy("start", "end")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_prev = flagged.withColumn("__prev_max", F.max("end").over(w_prev))
    islands = with_prev.withColumn(
        "__island",
        F.sum(
            F.when(
                F.col("__prev_max").isNull()
                | (F.col("start") > F.col("__prev_max")),
                1,
            ).otherwise(0)
        ).over(w_run),
    )
    spans = islands.groupBy(id_col, "__island").agg(
        F.min("start").alias("s"), F.max("end").alias("e")
    )

    # Array-side rebuild: collect each document's merged spans into one
    # sorted array (rows exist ONLY for documents that lose a span) and
    # splice the token array between consecutive spans. Replaces the
    # per-token explode + (doc, pos) anti-join + collect_list re-sort —
    # three corpus-TOKEN-sized exchanges — with one doc-keyed join whose
    # build side is just the affected documents.
    doc_spans = spans.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct(F.col("s"), F.col("e")))).alias(
            "__spans"
        )
    )

    def _slice(start0, length):
        # slice() is 1-based and rejects length 0; guard the empty cut.
        return F.when(length > 0, F.slice(F.col("__t"), start0 + 1, length)).otherwise(
            F.array().cast("array<string>")
        )

    kept_arr = F.when(F.col("__spans").isNull(), F.col("__t")).otherwise(
        F.aggregate(
            "__spans",
            F.struct(
                F.array().cast("array<string>").alias("acc"),
                F.lit(0).alias("prev"),
            ),
            lambda a, sp: F.struct(
                F.concat(a["acc"], _slice(a["prev"], sp["s"] - a["prev"])).alias(
                    "acc"
                ),
                sp["e"].alias("prev"),
            ),
            lambda a: F.concat(
                a["acc"], _slice(a["prev"], F.size("__t") - a["prev"])
            ),
        )
    )

    return base.join(doc_spans, id_col, "left").select(
        F.col(id_col),
        F.array_join(kept_arr, " ").alias("clean_text"),
        F.size("__t").cast("bigint").alias("n_tokens"),
        F.size(kept_arr).cast("bigint").alias("n_kept"),
        (F.size("__t") - F.size(kept_arr)).cast("bigint").alias("n_removed"),
    )
