"""Repetition quality filters (Gopher-style) for training corpora.

Rae et al. 2021 (Gopher, sec. A1.1) drop documents whose content is
dominated by repeated fragments: a high duplicate-n-gram fraction or a
single token covering too much of the document marks boilerplate, spam,
and scraper loops. These are the standard pre-training quality gates next
to stopword/length heuristics (operators/text.py).

Both metrics here are row-local array expressions — no shuffle, no UDF;
a repetition-filtered scan is still just a scan:

- top-token fraction: count of the most frequent token / token count.
  Computed per row with ``aggregate`` over the distinct-token array
  rather than a corpus-wide groupBy — the document is the unit, so
  keeping it row-local avoids a doc-keyed exchange entirely.
- duplicate-bigram fraction: 1 - distinct_bigrams/total_bigrams, via
  ``zip_with`` of the token array against itself shifted by one.

Integer determinism: fractions are FLOOR-scaled to basis points, the
same cross-engine-stable convention as operators/text.quality_metrics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def top_token_count(text: Column) -> Column:
    """Occurrences of the most frequent token, computed row-locally:
    for each distinct token, count its occurrences in the token array,
    then take the max. Documents are bounded (kilobytes), so the O(d*n)
    array walk is cheap and stays inside codegen."""
    toks = _tokens(text)
    per_distinct = F.transform(
        F.array_distinct(toks),
        lambda t: F.size(F.filter(toks, lambda x: x == t)),
    )
    return F.array_max(per_distinct).cast("bigint")


def bigrams(text: Column) -> Column:
    """Adjacent token pairs as 'a b' strings (empty array for 1-token
    docs)."""
    toks = _tokens(text)
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )


def repetition_metrics(text: Column) -> dict[str, Column]:
    """Gopher-gate signals, integer-scaled:

    - ``n_tokens``, ``top_token_n``: raw counts
    - ``top_token_bp``: top-token coverage in basis points
    - ``dup_bigram_bp``: duplicate-bigram fraction in basis points
      (0 when the doc has fewer than 2 tokens)
    """
    toks = _tokens(text)
    n_tok = F.size(toks).cast("bigint")
    top_n = top_token_count(text)
    bg = bigrams(text)
    n_bg = F.size(bg).cast("bigint")
    n_bg_distinct = F.size(F.array_distinct(bg)).cast("bigint")
    top_bp = F.floor(
        F.lit(10000.0) * top_n.cast("double") / n_tok.cast("double")
    ).cast("bigint")
    dup_bp = F.when(n_bg > 0, F.floor(
        F.lit(10000.0)
        * (n_bg - n_bg_distinct).cast("double")
        / n_bg.cast("double")
    ).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return {
        "n_tokens": n_tok,
        "top_token_n": top_n,
        "top_token_bp": top_bp,
        "dup_bigram_bp": dup_bp,
    }
