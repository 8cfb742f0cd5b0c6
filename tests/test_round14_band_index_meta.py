"""Round 14 (ADVICE r13, medium): a materialized MinHash band index
carries its banding parameters as constant metadata columns, and
incremental_lsh_dedup verifies them at entry. Before this, an index
built with different (num_hashes, rows_per_band) passed the schema
check but its band keys never equi-joined the delta's — the screen
silently returned kept=1 for every doc, wrong results with no error.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.minhash import (
    BAND_INDEX_META_COLS,
    incremental_lsh_dedup,
    materialize_epoch_band_index,
    minhash_band_keys,
    doc_shingles,
)


def _rows(df):
    return {(r.doc_id, r.kept, r.dup_of, r.jaccard_bp) for r in df.collect()}


@pytest.fixture()
def corpus(spark):
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base = spark.createDataFrame(
        [(i, f"{words} doc {i} tail " + " ".join(["pad"] * (i % 5))) for i in range(40)],
        ["doc_id", "text"],
    )
    delta = base.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    return base, delta


def test_artifact_carries_banding_metadata(spark, tmp_path, corpus):
    base, _ = corpus
    path = str(tmp_path / "idx")
    materialize_epoch_band_index(base, path, num_hashes=8, rows_per_band=4)
    idx = spark.read.parquet(path)
    assert set(BAND_INDEX_META_COLS) <= set(idx.columns)
    metas = idx.select(*BAND_INDEX_META_COLS).distinct().collect()
    assert [(m[0], m[1]) for m in metas] == [(8, 4)]


def test_matching_metadata_equals_inline(spark, tmp_path, corpus):
    base, delta = corpus
    path = str(tmp_path / "idx")
    materialize_epoch_band_index(base, path)
    idx = spark.read.parquet(path)
    got = _rows(incremental_lsh_dedup(base, delta, base_index=idx))
    want = _rows(incremental_lsh_dedup(base, delta))
    assert got == want and got


def test_mismatched_banding_raises_at_entry(spark, tmp_path, corpus):
    base, delta = corpus
    path = str(tmp_path / "idx_h12r6")
    materialize_epoch_band_index(
        base, path, num_hashes=12, rows_per_band=6
    )
    idx = spark.read.parquet(path)
    with pytest.raises(ValueError, match="num_hashes=12"):
        incremental_lsh_dedup(base, delta, base_index=idx)
    # and the same artifact is accepted by a screen that matches it
    out = incremental_lsh_dedup(
        base, delta, num_hashes=12, rows_per_band=6, base_index=idx
    )
    assert out.count() == delta.count()


def test_bare_band_keys_relation_stays_trusted(spark, corpus):
    """A plain minhash_band_keys relation (no meta columns) is the
    pre-r14 contract: ownership of the banding stays with the caller's
    tag, and the screen must keep accepting it."""
    base, delta = corpus
    idx = minhash_band_keys(
        doc_shingles(base, "doc_id", "text", distinct=False), "doc_id", 8, 4
    )
    got = _rows(incremental_lsh_dedup(base, delta, base_index=idx))
    want = _rows(incremental_lsh_dedup(base, delta))
    assert got == want and got


def test_empty_index_with_metadata_passes_entry_check(spark, tmp_path, corpus):
    base, delta = corpus
    path = str(tmp_path / "idx_empty")
    materialize_epoch_band_index(
        base.filter(F.lit(False)), path, num_hashes=8, rows_per_band=4
    )
    idx = spark.read.parquet(path)
    out = incremental_lsh_dedup(base, delta, base_index=idx)
    assert {r.kept for r in out.collect()} == {1}
