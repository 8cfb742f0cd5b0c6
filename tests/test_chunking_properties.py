"""Property tests for token-window chunking — the invariants a training
packer depends on:

- tiling: the non-overlap prefixes of consecutive chunks reconstruct the
  document exactly (no token lost, none duplicated outside the overlap);
- every chunk except the last has exactly ``window`` tokens, the last
  has 1..window;
- consecutive chunks share exactly ``overlap`` tokens.

Cases are packed into one DataFrame so each hypothesis example costs a
single Spark job.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from oic_options_chains_spark.operators.chunking import chunk_documents

_params = st.tuples(
    st.integers(1, 200),  # n_tokens
    st.integers(2, 64),   # window
    st.integers(0, 32),   # overlap (clamped below window)
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_params, min_size=1, max_size=10))
def test_chunking_tiles_documents(spark, cases):
    # group cases by (window, overlap) since those are operator params
    by_wo: dict[tuple[int, int], list[tuple[int, int]]] = {}
    for i, (n, w, o) in enumerate(cases):
        o = min(o, w - 1)
        by_wo.setdefault((w, o), []).append((i, n))

    for (window, overlap), docs in by_wo.items():
        df = spark.createDataFrame(
            [(i, " ".join(f"t{k}" for k in range(n))) for i, n in docs],
            "doc_id long, text string",
        )
        out = chunk_documents(df, window=window, overlap=overlap)
        rows = out.collect()
        step = window - overlap
        for i, n in docs:
            mine = sorted(
                (r for r in rows if r.doc_id == i), key=lambda r: r.chunk_id
            )
            # starts advance by step while they contribute new tokens
            assert [r.start_token for r in mine] == [
                s for s in range(0, max(n - overlap, 1), step)
            ]
            # all chunks full except possibly the last
            for r in mine[:-1]:
                assert r.n_chunk_tokens == window
            assert 1 <= mine[-1].n_chunk_tokens <= window
            # tiling: stitch non-overlap prefixes + final chunk remainder
            stitched: list[str] = []
            for r in mine:
                toks = r.chunk_text.split(" ")
                keep = toks if r is mine[-1] else toks[:step]
                stitched.extend(keep[: n - len(stitched)])
            assert stitched == [f"t{k}" for k in range(n)]


def test_sequence_boundaries_tile_each_sequence(spark):
    # Within every (shard, seq), segments are disjoint, ordered, and
    # tile the sequence exactly up to the shard stream's end.
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.chunking import sequence_boundaries

    df = spark.createDataFrame(
        [(i, (i * 37) % 100 + 1) for i in range(200)], "doc_id bigint, n_tokens bigint"
    )
    b = sequence_boundaries(df, context=64, n_shards=4).collect()
    by_seq = {}
    for r in b:
        by_seq.setdefault((r["shard"], r["seq_index"]), []).append(
            (r["seg_start"], r["seg_end"])
        )
    for (shard, seq), segs in by_seq.items():
        segs.sort()
        assert segs[0][0] == 0
        for (s1, e1), (s2, e2) in zip(segs, segs[1:]):
            assert e1 == s2, (shard, seq, segs)
        assert segs[-1][1] <= 64
    # total boundary token count == total tokens
    total = sum(e - s for segs in by_seq.values() for s, e in segs)
    assert total == sum((i * 37) % 100 + 1 for i in range(200))
