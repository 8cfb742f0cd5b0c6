"""Streaming near-dup (streaming/neardup_stream): cross-batch bucket
ownership, and batch==streamed equivalence against the batch OPH tier
when ingest files arrive id-ordered."""

from __future__ import annotations

import json

import pytest

# full-profile only (r16): scale-heavy suite moved out of the driver's
# default pytest budget; tools/run_suite.py (-m "") still runs it
pytestmark = pytest.mark.full

from pyspark.sql import functions as F
from pyspark.sql import types as T

from oic_options_chains_spark.operators.minhash import doc_shingles, oph_band_keys
from oic_options_chains_spark.streaming.neardup_stream import streaming_near_dup

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "an entirely different document about spark structured streaming state"),
    (2, "the quick brown fox jumps over the lazy dog today"),  # dup of 0
    (3, "yet another unrelated piece of text with many unique words"),
    (4, "an entirely different document about spark structured streaming state"),  # dup of 1
    (5, "the quick brown fox jumps over the lazy dog today"),  # dup of 0
]


def _run_stream(spark, tmp_path, chunks):
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    for i, chunk in enumerate(chunks):
        (src / f"f{i}.json").write_text(
            "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in chunk)
        )
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = (
        streaming_near_dup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out)


def _batch_truth(spark):
    """(doc, dup_of) pairs the batch tier implies: per bucket, every doc
    except the min points at the min."""
    docs = spark.createDataFrame(DOCS, SCHEMA)
    sh = doc_shingles(docs, "doc_id", "text", distinct=False)
    bands = oph_band_keys(sh, "doc_id")
    owners = bands.groupBy("band", "band_key").agg(F.min("doc_id").alias("dup_of"))
    return {
        (r.doc_id, r.dup_of)
        for r in bands.join(owners, ["band", "band_key"])
        .filter(F.col("doc_id") != F.col("dup_of"))
        .select("doc_id", "dup_of")
        .distinct()
        .collect()
    }


def test_streamed_equals_batch_on_ordered_chunks(spark, tmp_path):
    """Files arrive doc_id-ordered (2 docs per micro-batch): the
    streamed candidate set must equal the batch bucket-owner truth."""
    chunks = [DOCS[0:2], DOCS[2:4], DOCS[4:6]]
    got = {
        (r.doc_id, r.dup_of)
        for r in _run_stream(spark, tmp_path, chunks)
        .select("doc_id", "dup_of")
        .distinct()
        .collect()
    }
    expect = _batch_truth(spark)
    assert got == expect
    assert (2, 0) in got and (5, 0) in got and (4, 1) in got
    # non-dups never flagged
    assert not any(d in (1, 3) for d, _ in got)


def test_within_batch_min_owner(spark, tmp_path):
    """Duplicates arriving in the SAME micro-batch: min doc_id owns the
    bucket, the rest point at it — deterministic under shuffle."""
    got = _run_stream(spark, tmp_path, [DOCS])  # all six in one batch
    pairs = {(r.doc_id, r.dup_of) for r in got.select("doc_id", "dup_of").collect()}
    assert (2, 0) in pairs and (5, 0) in pairs and (4, 1) in pairs
    assert not any(d in (1, 3) for d, _ in pairs)


def _run_image_stream(spark, tmp_path, chunks):
    from oic_options_chains_spark.streaming.neardup_stream import (
        streaming_image_near_dup,
    )

    src = tmp_path / "isrc"
    src.mkdir()
    out = str(tmp_path / "iout")
    ckpt = str(tmp_path / "ickpt")
    for i, chunk in enumerate(chunks):
        (src / f"f{i}.json").write_text(
            "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in chunk)
        )
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = (
        streaming_image_near_dup(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out)


def test_streaming_image_near_dup_cross_batch(spark, tmp_path):
    """The aHash twin: identical rasters streamed in LATER micro-batches
    point at the first-arrival owner (all four bands collide), and the
    case-folded variant (uniform brightness shift) still shares at
    least one band with its original — the cross-batch form of
    q_ahash_incremental's delta-vs-base screen."""
    docs = [
        (0, "the quick brown fox jumps over the lazy dog today " * 3),
        (1, "an entirely different text about spark streaming state " * 3),
        (2, "the quick brown fox jumps over the lazy dog today " * 3),  # exact
        (3, ("the quick brown fox jumps over the lazy dog today " * 3).upper()),
    ]
    got = _run_image_stream(spark, tmp_path, [docs[0:2], docs[2:3], docs[3:4]])
    pairs = {(r.doc_id, r.dup_of) for r in got.select("doc_id", "dup_of").collect()}
    assert (2, 0) in pairs  # exact raster: every band bucket owned by 0
    assert (3, 0) in pairs  # shift-invariant bits: >=1 shared band
    assert not any(d == 1 for d, _ in pairs)  # unrelated text never flagged


def test_image_stream_state_bounded_by_band_space_not_corpus(spark, tmp_path):
    """VERDICT r8 item 8: keyed state must be bounded by the BAND-KEY
    space, not rows ingested. Stream a corpus in chunks, then stream the
    SAME texts under fresh ids (2x the input rows): the state row count
    must equal the distinct (band, band_key) count of the corpus and
    must NOT grow during the second pass — re-offered content hits
    owned buckets and adds zero state."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "tools")
    )
    from stream_bench import drain_with_progress, stage_chunked_source

    from oic_options_chains_spark.operators.phash import ahash_band_table
    from oic_options_chains_spark.streaming.neardup_stream import (
        streaming_image_near_dup,
    )

    sf_dir = "/root/testdata/sf0.001"
    src = str(tmp_path / "src")
    n = stage_chunked_source(spark, sf_dir, src, chunks=3)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
    )
    batches = drain_with_progress(
        streaming_image_near_dup(stream),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    assert sum(b["input_rows"] for b in batches) == n  # both passes ran

    from pyspark.sql import functions as F

    from oic_options_chains_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # checkpoint barrier (the ahash_pairs shield) so the posexplode's
    # inferred size() filter can't fuse the hash pipeline into the scan
    hashed = ahash_band_table(docs).localCheckpoint(eager=True)
    n_buckets = (
        hashed.select(F.posexplode("__bands").alias("band", "bv"))
        .distinct()
        .count()
    )
    final_state = batches[-1]["state_rows"]
    assert final_state == n_buckets, (final_state, n_buckets)
    # the second pass (re-idded identical texts) grew input, not state
    half = len(batches) // 2
    assert batches[half - 1]["state_rows"] == final_state
    assert max(b["state_rows"] for b in batches) == final_state


def test_corpus_admission_state_bounded_by_fingerprint_space(spark, tmp_path):
    """The corpus twin of the band-space bound: first-seen fingerprint
    state equals the distinct fingerprints of the GATED corpus and is
    flat across a full re-offer under fresh ids."""
    import sys as _sys
    from pathlib import Path

    _sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "tools")
    )
    from stream_bench import drain_with_progress, stage_chunked_source

    from oic_options_chains_spark.streaming.corpus_pipeline import (
        corpus_build_admission,
    )

    sf_dir = "/root/testdata/sf0.001"
    src = str(tmp_path / "src")
    stage_chunked_source(spark, sf_dir, src, chunks=3)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
    )
    batches = drain_with_progress(
        corpus_build_admission(stream),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    admitted = spark.read.parquet(str(tmp_path / "out"))
    n_fp = admitted.select("fingerprint").distinct().count()
    final_state = batches[-1]["state_rows"]
    assert final_state == n_fp, (final_state, n_fp)
    half = len(batches) // 2
    assert batches[half - 1]["state_rows"] == final_state
    assert max(b["state_rows"] for b in batches) == final_state


def test_image_stream_state_survives_restart(spark, tmp_path):
    """Keyed-state RECOVERY: drain the first half of the corpus, let the
    query terminate, add the second half (re-idded identical texts) and
    start a FRESH query on the same checkpoint. The restarted query must
    restore bucket ownership from the state store — every second-pass
    image points at its first-pass owner, no bucket is re-owned, and the
    combined output equals a single uninterrupted run's."""
    import json as _json

    from oic_options_chains_spark.streaming.neardup_stream import (
        streaming_image_near_dup,
    )

    docs = [
        (0, "the quick brown fox jumps over the lazy dog today"),
        (1, "an entirely different document about spark streaming state"),
        (2, "yet another unrelated piece of text with many unique words"),
    ]
    src = tmp_path / "src"
    src.mkdir()
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(str(src))
        )
        q = (
            streaming_image_near_dup(stream)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    (src / "pass1.json").write_text(
        "\n".join(_json.dumps({"doc_id": d, "text": t}) for d, t in docs)
    )
    run_once()  # pass 1: three owners established, zero dup rows
    assert spark.read.parquet(out).count() == 0

    (src / "pass2.json").write_text(
        "\n".join(
            _json.dumps({"doc_id": d + 100, "text": t}) for d, t in docs
        )
    )
    run_once()  # fresh query object, same checkpoint: state must restore
    got = {
        (r.doc_id, r.dup_of)
        for r in spark.read.parquet(out)
        .select("doc_id", "dup_of")
        .distinct()
        .collect()
    }
    # every re-offered image points at its ORIGINAL owner (4 bands each)
    assert got == {(d + 100, d) for d, _ in docs}


def _run_image_stream_verified(spark, tmp_path, chunks, max_hamming=3):
    from oic_options_chains_spark.streaming.neardup_stream import (
        streaming_image_near_dup,
    )

    src = tmp_path / "vsrc"
    src.mkdir()
    out = str(tmp_path / "vout")
    ckpt = str(tmp_path / "vckpt")
    for i, chunk in enumerate(chunks):
        (src / f"f{i}.json").write_text(
            "\n".join(json.dumps({"doc_id": d, "text": t}) for d, t in chunk)
        )
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).json(str(src))
    )
    q = (
        streaming_image_near_dup(stream, verify=True, max_hamming=max_hamming)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.read.parquet(out)


def test_verified_image_stream_emits_true_dups_with_distance(spark, tmp_path):
    """verify=True: the case-folded sibling is emitted WITH its Hamming
    distance (<= 3, the shift-invariance property), the exact raster at
    distance 0, and the unrelated text never appears — matching the
    batch tier's verified semantics instead of band-collision
    candidates."""
    docs = [
        (0, "the quick brown fox jumps over the lazy dog today " * 3),
        (1, "an entirely different text about spark streaming state " * 3),
        (2, "the quick brown fox jumps over the lazy dog today " * 3),  # exact
        (3, ("the quick brown fox jumps over the lazy dog today " * 3).upper()),
    ]
    got = _run_image_stream_verified(
        spark, tmp_path, [docs[0:2], docs[2:3], docs[3:4]], max_hamming=4
    )
    rows = {(r.doc_id, r.dup_of): r.hamming for r in got.collect()}
    assert rows.get((2, 0)) == 0  # identical raster
    # this particular case-folded raster measures Hamming 4 (verified
    # batch-side); the kernel must emit it at the matching threshold
    # WITH the true distance — and would rightly drop it at 3
    assert rows.get((3, 0)) == 4
    assert not any(d == 1 or o == 1 for d, o in rows)


def test_verified_kernel_suppresses_band_collision_false_positives(spark, tmp_path):
    """A crafted hot bucket: three docs share band 0's key, but only one
    is within Hamming<=3 of the owner. The unverified kernel emits both
    later docs; the verified kernel emits only the true dup — the
    precision property that matters when a skewed corpus biases one
    band (the batch tier's hot-bucket scenario)."""
    import json as _json

    from oic_options_chains_spark.streaming.neardup_stream import (
        verified_bucket_owner_pairs,
    )

    # owner 10: hash (7, 0, 0, 0); doc 11: flips one bit of band 2
    # (hamming 1 -> true dup); doc 12: same band-0 key but the other
    # bands differ massively (hamming 24 -> band-collision artifact)
    rows = [
        {"band": 0, "band_key": "7", "doc_id": 10, "__hb1": 7, "__hb2": 0, "__hb3": 0, "__hb4": 0},
        {"band": 0, "band_key": "7", "doc_id": 11, "__hb1": 7, "__hb2": 2, "__hb3": 0, "__hb4": 0},
        {"band": 0, "band_key": "7", "doc_id": 12, "__hb1": 7, "__hb2": 65535, "__hb3": 255, "__hb4": 0},
    ]
    src = tmp_path / "ksrc"
    src.mkdir()
    (src / "f0.json").write_text(_json.dumps(rows[0]))
    (src / "f1.json").write_text("\n".join(_json.dumps(r) for r in rows[1:]))
    schema = (
        "band int, band_key string, doc_id long, "
        "__hb1 long, __hb2 long, __hb3 long, __hb4 long"
    )
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(str(src))
    )
    out = str(tmp_path / "kout")
    q = (
        verified_bucket_owner_pairs(stream, max_hamming=3)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "kckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r.doc_id, r.dup_of, r.hamming) for r in spark.read.parquet(out).collect()}
    assert got == {(11, 10, 1)}
