"""Streaming delta-vs-base MinHash CANDIDATE screen: band-join each
micro-batch of a live text crawl against the materialized MinHash epoch
band index — the streamable half of incremental text dedup (round 14,
VERDICT r13 item 4).

The round-13 asymmetry note (SCALING.md) documented why the MinHash
incremental screen, unlike the aHash one, does not stream WHOLE: its
exact verify is a per-pair shingle-intersection AGGREGATION, which
append mode cannot express. But the candidate half — delta docs
band-joined against a frozen epoch index — is exactly the
stream-static shape streaming/incremental_screen_stream.py already
runs for media, and in production it is the half that wants to be
live: candidates surface as documents arrive, and the bounded Jaccard
verify over the (tiny) candidate frontier runs in the batch layer
(operators/minhash.incremental_lsh_dedup owns it — its verify scan is
already semi-join-pruned to exactly such a frontier). This module
makes that documented routing tested code.

Statelessness argument, same as the media twin: the reference side is
an epoch artifact, frozen until the next epoch re-materializes it, so
whether an incoming doc shares a band with the BASE depends only on
itself and the (static) index — batch 7's candidates cannot depend on
batches 1-6, and chunking cannot change any candidate
(tests/test_round14_minhash_stream.py pins streamed == batch under
arbitrary chunking). Delta-internal duplicates are deliberately out of
scope here exactly as in the batch operator: the stream's own past is
streaming/neardup_stream.py's keyed-state job.

Per-row banding: the relational MinHash path aggregates (groupBy min
over exploded shingles) — not append-streamable — so the delta side
uses operators/minhash.minhash_band_keys_from_shingles over a
separately projected shingle array, the per-row fold pinned
bit-identical to the relational band keys. Emit-once comes from
the first-matching-band rule (the aHash first-band pattern): the
static side carries each base doc's FULL key array, so a pair matching
in several bands is emitted exactly once, from its earliest band — a
streaming ``dropDuplicates`` would otherwise need unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.minhash import (
    _check_band_index_params,
    minhash_band_keys_from_shingles,
    shingles,
)


def streaming_minhash_candidate_screen(
    stream_docs: DataFrame,
    base_index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 4,
    pin_dir: str | None = None,
) -> DataFrame:
    """(delta_id, base_id) append-mode CANDIDATE pairs of a STREAMING
    document relation against a STATIC materialized MinHash band index
    (the relation :func:`operators.minhash.materialize_epoch_band_index`
    wrote, read back as a scan) — one row per (delta doc, base doc)
    pair sharing at least one band key, emitted from the first such
    band. Exact-verification (shingle Jaccard) is the batch layer's
    job; feed the drained candidate frontier to
    :func:`operators.minhash.incremental_lsh_dedup`.

    ``stream_docs`` must be streaming and ``base_index`` static — a
    streaming reference would make the band join stream-stream, the
    shape this operator exists to avoid. An index materialized with a
    different (num_hashes, rows_per_band) is rejected at entry via its
    metadata columns (band keys from a mismatched banding never
    equi-join — the screen would silently emit nothing).

    ``pin_dir`` (ADVICE r14): where to pin the WIDENED base index for
    the lifetime of the query. By default it is pinned via
    ``localCheckpoint`` — executor block storage, which a lost executor
    invalidates, failing the long-running streaming query mid-flight
    (acceptable single-box / supervised-restart semantics: the query
    restarts from its sink checkpoint and re-widens). For
    deployment-grade streams pass a reliable-storage path (e.g. a
    ``widened/`` dir beside the epoch artifact): the widened index is
    written there as parquet once at stream construction and every
    micro-batch scans THAT, surviving executor loss like any other
    static source."""
    if not stream_docs.isStreaming:
        raise TypeError(
            "stream_docs must be a streaming relation; for batch deltas "
            "use operators/minhash.incremental_lsh_dedup"
        )
    if base_index.isStreaming:
        raise TypeError("base_index must be static (the epoch artifact)")
    missing = {id_col, "band", "band_key"} - set(base_index.columns)
    if missing:
        raise ValueError(
            f"base_index lacks the minhash_band_keys contract "
            f"columns {sorted(missing)}; got {base_index.columns}"
        )
    _check_band_index_params(base_index, num_hashes, rows_per_band)
    # the static side needs each base doc's FULL key array for the
    # first-matching-band emit-once rule, and the widening is an
    # aggregation — a static subplan a streaming query would otherwise
    # re-evaluate every micro-batch. Compute it ONCE at stream
    # construction and checkpoint (the incremental_screen_stream
    # hot-key pattern); the index is bands-per-doc rows of short
    # digests — a fraction of a percent of the corpus it indexes — so
    # the frozen copy is epoch-artifact-sized, not corpus-sized.
    base_wide = (
        base_index.select(id_col, "band", "band_key")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("band", "band_key"))),
                lambda e: e["band_key"],
            ).alias("__bk")
        )
        .select(
            F.col(id_col).alias("base_id"),
            "__bk",
            F.posexplode("__bk").alias("band", "band_key"),
        )
    )
    if pin_dir is not None:
        # reliable-storage pin: survives executor loss (localCheckpoint
        # blocks do not), at the cost of one parquet write per stream
        # construction — epoch-artifact-sized, not corpus-sized
        base_wide.write.mode("overwrite").parquet(pin_dir)
        base_wide = stream_docs.sparkSession.read.parquet(pin_dir)
    else:
        base_wide = base_wide.localCheckpoint(eager=True)
    return _candidate_screen_plan(
        stream_docs, base_wide, id_col, text_col, num_hashes, rows_per_band
    )


def _candidate_screen_plan(
    docs: DataFrame,
    base_wide: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int,
    rows_per_band: int,
) -> DataFrame:
    """The per-micro-batch candidate plan over an ALREADY-WIDENED static
    side, factored out so the fused-filter plan gate
    (tests/test_plans.py) can audit the exact shape every micro-batch
    runs on a STATIC docs frame — a streaming DataFrame cannot expose
    its optimized plan before writeStream.start()."""
    n_bands = num_hashes // rows_per_band
    # two-step projection on purpose: the band-key expression references
    # its shingle array num_hashes+1 times, so materializing __sh in its
    # own Project keeps tokenization at once per row (the from_shingles
    # docstring prices the inlined form at 9x; measured 3.2x end-to-end)
    delta_keys = docs.select(
        F.col(id_col).alias("delta_id"),
        shingles(F.col(text_col)).alias("__sh"),
    ).select(
        "delta_id",
        minhash_band_keys_from_shingles(
            F.col("__sh"), num_hashes, rows_per_band
        ).alias("__dk"),
    )
    # every key-derived output — band, band_key, AND the full key array
    # the emit-once filter reads — leaves the Generate as a GENERATED
    # struct field: predicates on generated attributes cannot push
    # beneath the Generate, which is what stops
    # InferFiltersFromConstraints (isnotnull from the emit-once
    # element_at comparisons, size > 0 from a non-outer explode) from
    # substituting the whole shingle->minhash pipeline into one
    # per-scan-row interpreted Filter. Same trap, same fix as
    # phash.incremental_screen_hits' banded() — found round 14 by
    # stream-benching the screens at sf0.1 (~0.2 s/row fused vs ~ms
    # staged); the batch operator never sees it because its delta
    # relation is checkpoint-shielded. __dk is referenced twice inside
    # the generator on purpose (SPARK-36718's duplicate-expensive
    # guard keeps its projection staged — one minhash pass per row).
    # A null __dk (doc too short to shingle) yields null struct vals,
    # dropped by the generated-attribute filter.
    per_band = F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda i: F.struct(
            i.cast("int").alias("band"),
            F.element_at(F.col("__dk"), (i + 1).cast("int")).alias("key"),
            F.col("__dk").alias("arr"),
        ),
    )
    exploded = (
        delta_keys.select(
            "delta_id", F.posexplode_outer(per_band).alias("__pos", "__s")
        )
        .select(
            "delta_id",
            F.col("__s.band").alias("band"),
            F.col("__s.key").alias("band_key"),
            F.col("__s.arr").alias("__dk"),
        )
        .filter(F.col("band_key").isNotNull())
    )
    joined = exploded.join(base_wide, on=["band", "band_key"])
    earlier = F.lit(False)
    for j in range(n_bands - 1):
        earlier = earlier | (
            (F.col("band") > j)
            & (
                F.element_at("__dk", j + 1)
                == F.element_at("__bk", j + 1)
            )
        )
    return joined.filter(~earlier).select("delta_id", "base_id")
