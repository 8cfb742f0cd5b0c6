"""Streaming scale evidence (VERDICT r8 item 8): micro-batch throughput
and state-store growth for the two streaming twins —
``streaming_image_near_dup`` (aHash band-bucket ownership) and the
corpus admission pipeline (fingerprint first-seen state).

The 100 TB claim under test: keyed state is bounded by the BAND-KEY /
FINGERPRINT space, not by rows ingested — re-offering the same content
under fresh ids must add input rows but ZERO state rows. Each run
streams the corpus once, then streams the SAME texts re-idded, and
reports per-batch (input rows, trigger ms, state rows, state bytes).

Usage: python tools/stream_bench.py [--sf-dirs DIR ...] [--chunks 5]
Prints one JSON line per (pipeline, sf_dir) with the per-batch series.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def stage_chunked_source(
    spark,
    sf_dir: str,
    src_dir: str,
    chunks: int,
    offsets: tuple[int, int] = (0, 10_000_000),
) -> int:
    """Write documents as ``2 * chunks`` parquet files: the corpus in
    id-ascending chunks, then the same texts re-idded (second offset) —
    the state-growth probe. Returns total rows staged. The stateless
    epoch-screen runners pass disjoint ``offsets`` so the streamed ids
    never collide with the base index's own id space."""
    from pyspark.sql import functions as F

    from oic_options_chains_spark.sources.registry import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    os.makedirs(src_dir, exist_ok=True)
    step = -(-len(docs) // chunks)
    total = 0
    for offset, tag in zip(offsets, ("a", "b")):
        for i in range(chunks):
            part = docs[i * step : (i + 1) * step]
            if not part:
                continue
            pdf = spark.createDataFrame(
                [(r["doc_id"] + offset, r["text"]) for r in part],
                "doc_id long, text string",
            )
            pdf.coalesce(1).write.mode("overwrite").parquet(
                f"{src_dir}/chunk_{tag}{i:03d}"
            )
            total += len(part)
    return total


def drain_with_progress(stream_df, out_dir: str, ckpt_dir: str) -> list[dict]:
    """AvailableNow drain of a streaming DataFrame into parquet,
    returning the per-micro-batch progress rows: input rows, trigger
    wall ms, and the state operator's total rows / memory bytes."""
    q = (
        stream_df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return progress_rows(q)


def progress_rows(q) -> list[dict]:
    """Per-micro-batch (input rows, trigger ms, state rows/bytes) from a
    terminated StreamingQuery — shared by the parquet-sink drains and
    the foreachBatch pipelines (DSIR model, HLL registers), whose state
    lives in their own storage so stateOperators is empty by design."""
    batches = []
    for p in q.recentProgress:
        prog = json.loads(p.json) if hasattr(p, "json") else dict(p)
        ops = prog.get("stateOperators") or []
        st = ops[0] if ops else {}
        batches.append(
            {
                "input_rows": prog.get("numInputRows", 0),
                "trigger_ms": (prog.get("durationMs") or {}).get(
                    "triggerExecution", 0
                ),
                "state_rows": st.get("numRowsTotal", 0),
                "state_bytes": st.get("memoryUsedBytes", 0),
            }
        )
    return [b for b in batches if b["input_rows"]]


def run_image_near_dup(spark, sf_dir: str, work: str, chunks: int) -> dict:
    from oic_options_chains_spark.streaming.neardup_stream import (
        streaming_image_near_dup,
    )

    src = f"{work}/img_src"
    n = stage_chunked_source(spark, sf_dir, src, chunks)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
    )
    batches = drain_with_progress(
        streaming_image_near_dup(stream), f"{work}/img_out", f"{work}/img_ckpt"
    )
    return {"pipeline": "streaming_image_near_dup", "sf_dir": sf_dir,
            "rows_staged": n, "batches": batches}


def run_image_near_dup_verified(spark, sf_dir: str, work: str, chunks: int) -> dict:
    """The verify=True twin: owner hash rides in state (5 longs/bucket)
    and candidates are Hamming-checked in-kernel — the series shows the
    precision upgrade costs ~nothing in throughput and state stays
    bucket-bounded (5x the bytes, same row count)."""
    from oic_options_chains_spark.streaming.neardup_stream import (
        streaming_image_near_dup,
    )

    src = f"{work}/imgv_src"
    n = stage_chunked_source(spark, sf_dir, src, chunks)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
    )
    batches = drain_with_progress(
        streaming_image_near_dup(stream, verify=True),
        f"{work}/imgv_out",
        f"{work}/imgv_ckpt",
    )
    return {"pipeline": "streaming_image_near_dup[verify]", "sf_dir": sf_dir,
            "rows_staged": n, "batches": batches}


def run_epoch_screen_ahash(spark, sf_dir: str, work: str, chunks: int) -> dict:
    """The STATELESS class (round 13/14): a live crawl screened against
    the frozen aHash epoch index. The claim under test flips the
    stateful runners': there must be NO state operator at all — every
    batch pays only its own hashing plus the stream-static bucket join,
    so state_rows stays 0 across the whole drain and the re-offer
    second half costs the same as the first."""
    from oic_options_chains_spark.operators.phash import (
        materialize_epoch_index,
    )
    from oic_options_chains_spark.sources.registry import load_table
    from oic_options_chains_spark.streaming.incremental_screen_stream import (
        streaming_incremental_screen,
    )

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx_path = f"{work}/ah_idx"
    materialize_epoch_index(base, idx_path)
    idx = spark.read.parquet(idx_path)
    src = f"{work}/ah_src"
    n = stage_chunked_source(
        spark, sf_dir, src, chunks, offsets=(10_000_000, 20_000_000)
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
    )
    batches = drain_with_progress(
        streaming_incremental_screen(stream, idx),
        f"{work}/ah_out",
        f"{work}/ah_ckpt",
    )
    return {"pipeline": "streaming_incremental_screen[ahash-epoch]",
            "sf_dir": sf_dir, "rows_staged": n, "batches": batches}


def run_epoch_screen_minhash(spark, sf_dir: str, work: str, chunks: int) -> dict:
    """The round-14 MinHash candidate half against the frozen band
    index — same stateless contract as the aHash screen (verify is the
    batch layer's job, so the stream carries no state at all)."""
    from oic_options_chains_spark.operators.minhash import (
        materialize_epoch_band_index,
    )
    from oic_options_chains_spark.sources.registry import load_table
    from oic_options_chains_spark.streaming.neardup_screen_stream import (
        streaming_minhash_candidate_screen,
    )

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx_path = f"{work}/mh_idx"
    materialize_epoch_band_index(base, idx_path)
    idx = spark.read.parquet(idx_path)
    src = f"{work}/mh_src"
    n = stage_chunked_source(
        spark, sf_dir, src, chunks, offsets=(10_000_000, 20_000_000)
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
    )
    batches = drain_with_progress(
        streaming_minhash_candidate_screen(stream, idx),
        f"{work}/mh_out",
        f"{work}/mh_ckpt",
    )
    return {"pipeline": "streaming_minhash_candidate_screen[epoch]",
            "sf_dir": sf_dir, "rows_staged": n, "batches": batches}


def run_minhash_screen_then_verify(
    spark, sf_dir: str, work: str, chunks: int
) -> dict:
    """Round 15 (VERDICT r14 item 5, bench row): the COMPOSED routing —
    the streamed candidate screen drains into the batch Jaccard verify
    via ``incremental_lsh_dedup(candidates=)``. The streamed half obeys
    the stateless contract (state_rows 0); the verify half's wall is
    reported separately (``verify_sec``) so the composition's cost split
    is visible. Correctness (composed == all-batch) is pinned by
    tests/test_round15_stream_compose.py; this runner records cost."""
    import time

    from oic_options_chains_spark.operators.minhash import (
        incremental_lsh_dedup,
        materialize_epoch_band_index,
    )
    from oic_options_chains_spark.sources.registry import load_table
    from oic_options_chains_spark.streaming.neardup_screen_stream import (
        streaming_minhash_candidate_screen,
    )

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    idx_path = f"{work}/mv_idx"
    materialize_epoch_band_index(base, idx_path)
    idx = spark.read.parquet(idx_path)
    src = f"{work}/mv_src"
    n = stage_chunked_source(
        spark, sf_dir, src, chunks, offsets=(10_000_000, 20_000_000)
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
    )
    out = f"{work}/mv_cand"
    batches = drain_with_progress(
        streaming_minhash_candidate_screen(stream, idx),
        out,
        f"{work}/mv_ckpt",
    )
    frontier = spark.read.parquet(out)
    delta = spark.read.parquet(f"{src}/chunk_*")
    t0 = time.monotonic()
    verified = incremental_lsh_dedup(
        base, delta, base_index=idx, candidates=frontier
    )
    dup_rows = verified.filter("kept = 0").count()
    verify_sec = round(time.monotonic() - t0, 2)
    return {
        "pipeline": "minhash_screen->batch_verify[composed]",
        "sf_dir": sf_dir,
        "rows_staged": n,
        "batches": batches,
        "verify_sec": verify_sec,
        "dup_rows": dup_rows,
    }


def run_decontam_stream(spark, sf_dir: str, work: str, chunks: int) -> dict:
    """Stateless class, embedding-typed: each micro-batch of crawl
    embeddings banded-screened against the FIXED broadcast eval suite
    (streaming/decontam_stream.py). No state operator at all — every
    batch pays its own hyperplane keys plus the stream-static broadcast
    join, so state_rows must stay 0 and the re-offer half must cost the
    same as the first."""
    from pyspark.sql import functions as F

    from oic_options_chains_spark.sources.registry import load_table
    from oic_options_chains_spark.streaming.decontam_stream import (
        streaming_decontam,
    )

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    ev = emb.filter(F.col("vec_id") % 10 == 0)
    probe = emb.filter(F.col("vec_id") % 10 != 0).orderBy("vec_id").collect()
    src = f"{work}/dc_src"
    os.makedirs(src, exist_ok=True)
    step = -(-len(probe) // chunks)
    n = 0
    for offset, tag in zip((10_000_000, 20_000_000), ("a", "b")):
        for i in range(chunks):
            part = probe[i * step : (i + 1) * step]
            if not part:
                continue
            spark.createDataFrame(
                [(r["vec_id"] + offset, r["embedding"]) for r in part],
                "vec_id long, embedding array<float>",
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{src}/chunk_{tag}{i:03d}"
            )
            n += len(part)
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
    )
    batches = drain_with_progress(
        streaming_decontam(stream, ev), f"{work}/dc_out", f"{work}/dc_ckpt"
    )
    return {"pipeline": "streaming_decontam[fixed-eval]", "sf_dir": sf_dir,
            "rows_staged": n, "batches": batches}


def run_dsir_model_stream(spark, sf_dir: str, work: str, chunks: int) -> dict:
    """foreachBatch class: each micro-batch folds its (bucket, c_raw,
    c_tgt) partial into the model store as a batch-keyed parquet dir —
    the streaming-state analog is the MODEL DIR, bounded by the bucket
    space (DSIR_BUCKETS) per batch, never by rows ingested. The series
    pins flat per-batch wall; replays overwrite their own batch dir."""
    from pyspark.sql import functions as F

    from oic_options_chains_spark.sources.registry import load_table
    from oic_options_chains_spark.streaming.selection_stream import (
        run_incremental_dsir_model,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text", "lang")
        .orderBy("doc_id")
        .collect()
    )
    src = f"{work}/ds_src"
    os.makedirs(src, exist_ok=True)
    step = -(-len(docs) // chunks)
    n = 0
    for offset, tag in zip((0, 10_000_000), ("a", "b")):
        for i in range(chunks):
            part = docs[i * step : (i + 1) * step]
            if not part:
                continue
            spark.createDataFrame(
                [(r["doc_id"] + offset, r["text"], r["lang"]) for r in part],
                "doc_id long, text string, lang string",
            ).coalesce(1).write.mode("overwrite").parquet(
                f"{src}/chunk_{tag}{i:03d}"
            )
            n += len(part)
    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
    )
    q = run_incremental_dsir_model(
        spark, stream, F.col("lang") == "en", f"{work}/ds_model",
        f"{work}/ds_ckpt",
    )
    return {"pipeline": "run_incremental_dsir_model", "sf_dir": sf_dir,
            "rows_staged": n, "batches": progress_rows(q)}


def run_sketch_distinct_stream(spark, sf_dir: str, work: str, chunks: int) -> dict:
    """foreachBatch class: running HLL distinct over document TEXTS.
    The register table is the state analog — fixed 2^b registers
    regardless of rows ingested — and the re-offer half (same texts,
    fresh ids) must leave the estimate unchanged while per-batch wall
    stays flat."""
    from oic_options_chains_spark.streaming.sketch_stream import (
        run_incremental_distinct,
    )

    src = f"{work}/sk_src"
    n = stage_chunked_source(spark, sf_dir, src, chunks)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
    )
    q = run_incremental_distinct(
        spark, stream, "text", f"{work}/sk_regs", f"{work}/sk_ckpt"
    )
    return {"pipeline": "run_incremental_distinct[text]", "sf_dir": sf_dir,
            "rows_staged": n, "batches": progress_rows(q)}


def run_corpus_admission(spark, sf_dir: str, work: str, chunks: int) -> dict:
    from oic_options_chains_spark.streaming.corpus_pipeline import (
        corpus_build_admission,
    )

    src = f"{work}/corp_src"
    n = stage_chunked_source(spark, sf_dir, src, chunks)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk_*")
    )
    batches = drain_with_progress(
        corpus_build_admission(stream), f"{work}/corp_out", f"{work}/corp_ckpt"
    )
    return {"pipeline": "corpus_build_admission", "sf_dir": sf_dir,
            "rows_staged": n, "batches": batches}


def main() -> None:
    import shutil
    import tempfile

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf-dirs",
        nargs="+",
        default=[
            os.path.join(repo, ".scale", "sf0.1"),
            os.path.join(repo, ".scale", "sf0.5"),
        ],
    )
    ap.add_argument("--chunks", type=int, default=5)
    ap.add_argument(
        "--pipelines",
        nargs="+",
        default=None,
        help="substring filter over runner names (e.g. 'epoch' runs "
        "only the stateless epoch-screen pair)",
    )
    args = ap.parse_args()

    from oic_options_chains_spark.session import get_spark

    spark = get_spark(app_name="oic-stream-bench")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in args.sf_dirs:
        runners = [
            run_image_near_dup,
            run_image_near_dup_verified,
            run_corpus_admission,
            run_epoch_screen_ahash,
            run_epoch_screen_minhash,
            run_minhash_screen_then_verify,
            run_decontam_stream,
            run_dsir_model_stream,
            run_sketch_distinct_stream,
        ]
        if args.pipelines:
            runners = [
                r
                for r in runners
                if any(p in r.__name__ for p in args.pipelines)
            ]
        for runner in runners:
            work = tempfile.mkdtemp(prefix="stream_bench_")
            try:
                out = runner(spark, sf_dir, work, args.chunks)
                bs = out["batches"]
                out["summary"] = {
                    "total_input_rows": sum(b["input_rows"] for b in bs),
                    "total_sec": round(
                        sum(b["trigger_ms"] for b in bs) / 1000, 2
                    ),
                    "rows_per_sec": round(
                        1000.0
                        * sum(b["input_rows"] for b in bs)
                        / max(sum(b["trigger_ms"] for b in bs), 1)
                    ),
                    "final_state_rows": bs[-1]["state_rows"] if bs else 0,
                    "max_state_rows": max(
                        (b["state_rows"] for b in bs), default=0
                    ),
                }
                print(json.dumps(out), flush=True)
            finally:
                shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
