"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY.md section 2.9's Spark-native extension surface).

``first_seen_filter`` is streaming dedup with MEMORY of prior batches:
the file-source pipelines in ``incremental.py`` get exactly-once table
effects from idempotent sinks (anti-join per batch), which re-reads the
existing partition every batch. When the sink is append-only (a message
bus, a feature store, a downstream stream), the dedup has to live in the
stream itself — keyed state, one flag per key.

Scale notes:
- State is per-key and tiny (one long), hash-partitioned by the group
  key across executors; the state store checkpoints incrementally with
  the query. Memory is O(distinct keys), the same budget a streaming
  aggregation would hold.
- A TTL matters at corpus scale: unbounded key spaces (content hashes)
  would grow state forever. ``ttl_minutes`` maps to processing-time
  timeout so idle keys age out — after expiry a duplicate would pass
  again, the standard at-scale trade (bounded state, windowed dedup).
- The Python kernel is Arrow-batched per key group (pandas in, pandas
  out) — the contracted use of Python in this codebase, not a per-row
  UDF.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_filter(
    stream: DataFrame,
    key_cols: Sequence[str],
    ttl_minutes: int | None = None,
) -> DataFrame:
    """Emit only one row ever per key, across micro-batches.

    Within a batch an ARBITRARY row wins: rows reach the keyed kernel
    after a shuffle by key, which guarantees no intra-batch ordering —
    matching the reference's PK semantics, where whichever duplicate
    arrives first is kept and arrival order under concurrency is itself
    arbitrary. Callers that need a deterministic winner should order on
    an explicit sequence column upstream or aggregate with min_by.
    Later batches emit nothing for known keys until the key's state
    expires (``ttl_minutes``). Output schema == input schema.
    """
    out_schema = stream.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # key already emitted in a prior batch: swallow, refresh TTL
            if ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if first is None and len(pdf) > 0:
                first = pdf.head(1)
        state.update((1,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if first is not None:
            yield first

    return stream.groupBy(*key_cols).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=timeout,
    )


def first_seen_min_filter(
    stream: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    ttl_minutes: int | None = None,
) -> DataFrame:
    """``first_seen_filter`` with a DETERMINISTIC within-batch winner:
    the row minimizing ``order_col`` (ties by its first occurrence).

    Cross-batch semantics are unchanged — the first BATCH that carries a
    key emits one row and later batches emit nothing — but inside a
    batch the min-order row wins instead of an arbitrary shuffle
    survivor. When a source delivers files in ``order_col``-ascending
    chunks (e.g. doc_id-ranged ingest files), the streamed winner per
    key therefore equals the global-batch ``min(order_col)`` winner —
    the property the batch==streamed corpus equivalence test pins."""
    out_schema = stream.schema
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl_minutes is not None
        else GroupStateTimeout.NoTimeout
    )

    def dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            if ttl_minutes is not None:
                state.setTimeoutDuration(ttl_minutes * 60 * 1000)
            for _ in pdfs:
                pass
            return
        best = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            cand = pdf.loc[[pdf[order_col].idxmin()]]
            if best is None or cand[order_col].iloc[0] < best[order_col].iloc[0]:
                best = cand
        state.update((1,))
        if ttl_minutes is not None:
            state.setTimeoutDuration(ttl_minutes * 60 * 1000)
        if best is not None:
            yield best

    return stream.groupBy(*key_cols).applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType="seen long",
        outputMode="append",
        timeoutConf=timeout,
    )
