"""Streaming semantic decontamination: screen each micro-batch of crawl
embeddings against the FIXED eval/benchmark suite as it arrives.

Decontamination is the rare dedup family that streams STATELESSLY: the
reference side (the eval suite) does not grow with the crawl, so the
whole banded screen — hyperplane keys, emit-once bucket join, exact
cosine verify — is a per-row projection plus a stream-STATIC equi-join
against a broadcast relation. No keyed state, no watermark, no
cross-batch memory: whether a crawl document is contaminated depends
only on itself and the (static) suite, so batch 7's verdicts cannot
depend on batches 1-6. Contrast streaming/neardup_stream.py, where the
reference set IS the stream's own past and bucket ownership must live
in ``applyInPandasWithState``.

The output is the raw hit relation (id_a, id_b, score_e6) in append
mode — one row per (crawl doc, suite doc) contamination pair, exactly
the batch operator's pre-top-1 output. The per-document strongest-match
ranking (a window over id_a) is not append-streamable and belongs
downstream, where q_decontam_fixed_eval's batch form already does it.

Semantics equal the batch screen by construction: the SAME
``cross_near_pairs_banded`` plan runs per micro-batch, and since rows
are screened independently, chunking cannot change any verdict
(tests/test_decontam_stream.py pins streamed == batch on the same
corpus, any chunking)."""

from __future__ import annotations

from pyspark.sql import DataFrame

from oic_options_chains_spark.operators.similarity import (
    cross_near_pairs_banded,
)


def streaming_decontam(
    stream_embeddings: DataFrame,
    eval_embeddings: DataFrame,
    threshold: float = 0.35,
    **banded_kwargs,
) -> DataFrame:
    """(id_a, id_b, score_e6) append-mode hits of a STREAMING probe
    relation against a STATIC broadcast eval suite, at the banded
    screen's recall-contract defaults (L=28 x b=8: >= 9000 bp planted
    recall at cos >= 0.7; operators/similarity.py).

    ``stream_embeddings`` is a streaming (vec_id, embedding) relation;
    ``eval_embeddings`` a static one. Everything else is passed through
    to :func:`cross_near_pairs_banded` — the one requirement this
    wrapper enforces is the broadcast-reference shape, because a
    non-broadcast reference would make the bucket join stream-stream."""
    # caller-facing contract checks, so real exceptions (asserts vanish
    # under python -O and would let a stream-stream bucket join build)
    if eval_embeddings.isStreaming:
        raise TypeError("eval suite must be static, got a streaming relation")
    banded_kwargs.setdefault("broadcast_reference", True)
    if not banded_kwargs["broadcast_reference"]:
        raise ValueError(
            "streaming decontam requires the broadcast-reference shape "
            "(broadcast_reference=False would make the bucket join "
            "stream-stream)"
        )
    return cross_near_pairs_banded(
        stream_embeddings, eval_embeddings, threshold=threshold, **banded_kwargs
    )
