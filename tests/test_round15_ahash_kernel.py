"""Optimization r15: the vectorized aHash band kernel is bit-identical
to the expression tier it replaces for batch inputs.

``ahash_band_table`` routes batch inputs through ``_text_band_kernel``
(one numpy block-sum + threshold pass per Arrow batch); streaming
inputs keep the staged expression tier whose plan shape the r14
fused-filter gates pin. The hash is pure integer math on both tiers, so
the kernel may never move a band value: this pins kernel == expression
row-for-row on real corpus text plus the awkward shapes (NULL text,
empty text, short text, non-ASCII)."""

from __future__ import annotations

from oic_options_chains_spark.operators.phash import (
    _expression_band_table,
    _text_band_kernel,
)


def _as_map(df):
    return {
        r["__id"]: (None if r["__bands"] is None else tuple(r["__bands"]))
        for r in df.collect()
    }


def test_text_band_kernel_matches_expression_tier(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    got = _as_map(_text_band_kernel(d, "doc_id", "text"))
    want = _as_map(_expression_band_table(d))
    assert got == want
    assert len(got) > 0


def test_text_band_kernel_edge_shapes(spark):
    rows = [
        (1, None),
        (2, ""),
        (3, "a"),
        (4, "héllo wörld — ünïcode"),
        (5, "x" * 5000),
    ]
    d = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = _as_map(_text_band_kernel(d, "doc_id", "text"))
    want = _as_map(_expression_band_table(d))
    assert got == want
    assert got[1] is None
