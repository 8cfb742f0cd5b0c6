"""Checkpoint-lineage observability for the plan audit.

Every lineage barrier in the engine is a ``df.localCheckpoint(eager=..)``
call (35+ sites: iterative CC/BPE/k-NN loops, the media-kernel batch
shield, warehouse/snapshot staging).  A checkpoint truncates lineage, so
the final plan of a checkpointed query shows only the post-checkpoint
suffix — ``tools/plan_audit.py`` on r9's registry reported ``scans: 0``
for ``q_ahash_dedup`` because its whole hashing pipeline ran *before*
the barrier.  The r9 fused-filter trap (a staged expression pipeline
substituted into a per-row scan predicate, ~23 s/row) lived exactly in
such a hidden prefix.

:func:`capture_checkpoints` closes that blind spot without touching the
call sites: while the context is active, ``DataFrame.localCheckpoint``
is wrapped so each pre-truncation DataFrame is recorded (with its call
site) *before* the real checkpoint runs.  The audit then explains every
captured stage alongside the final plan and applies the same
fused-filter / python-eval / cartesian counters over the FULL lineage.

Production paths never enter the context — the wrapper exists only for
the duration of an audit/test block, and the patch is restored even on
error.  Single-threaded use only (the audit and the pytest gates are);
the patch is process-global, so nested or concurrent captures would
cross-attribute stages and restore the wrong original — a module-level
guard makes that misuse raise instead of corrupting the patch state.
"""

from __future__ import annotations

import os
import threading
import traceback
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import DataFrame

_PKG_ROOT = os.path.dirname(os.path.abspath(__file__))


def _checkpoint_classes() -> list[type]:
    """Every class that defines its own ``localCheckpoint``.

    PySpark 4 splits the API: ``pyspark.sql.DataFrame`` is the dispatch
    base and the concrete classic (py4j) DataFrame overrides the method,
    so patching only the base would never see an engine checkpoint.
    """
    classes = [DataFrame]
    try:
        from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

        classes.append(ClassicDF)
    except ImportError:  # pragma: no cover - pre-4.0 pyspark
        pass
    return [c for c in classes if "localCheckpoint" in c.__dict__]


class CapturedStage:
    """One pre-checkpoint DataFrame plus the engine call site that cut it."""

    __slots__ = ("site", "df")

    def __init__(self, site: str, df: DataFrame) -> None:
        self.site = site
        self.df = df

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"CapturedStage({self.site})"


def _call_site() -> str:
    """Innermost engine frame (file:line) that requested the checkpoint."""
    for frame in reversed(traceback.extract_stack()):
        path = os.path.abspath(frame.filename)
        if path.startswith(_PKG_ROOT) and os.path.basename(path) != "lineage.py":
            rel = os.path.relpath(path, os.path.dirname(_PKG_ROOT))
            return f"{rel}:{frame.lineno}"
    return "<outside-engine>"


@contextmanager
def capture_checkpoints() -> Iterator[list[CapturedStage]]:
    """Record every pre-checkpoint DataFrame built inside the block.

    Yields a list that fills as checkpoints fire (eager checkpoints run
    during query *construction*, so by the time the query builder
    returns, all its stages are captured).  The captured DataFrames keep
    their own QueryExecution: explaining them after the block is cheap
    and shows the stage's plan as it was before truncation — its own
    inputs are the *previous* checkpoint's scan, so stages tile the full
    lineage without double-counting.
    """
    if not _CAPTURE_ACTIVE.acquire(blocking=False):
        raise RuntimeError(
            "capture_checkpoints is already active in this process: the "
            "localCheckpoint patch is process-global and does not nest — "
            "finish (or stop concurrently starting) the other capture first"
        )
    try:
        yield from _capture_checkpoints_locked()
    finally:
        _CAPTURE_ACTIVE.release()


# non-reentrant by design: see capture_checkpoints
_CAPTURE_ACTIVE = threading.Lock()


def _capture_checkpoints_locked() -> Iterator[list[CapturedStage]]:
    captured: list[CapturedStage] = []
    originals = {cls: cls.__dict__["localCheckpoint"] for cls in _checkpoint_classes()}

    def make_capturing(original):
        def capturing(self, *args, **kwargs):
            captured.append(CapturedStage(_call_site(), self))
            return original(self, *args, **kwargs)

        return capturing

    for cls, original in originals.items():
        cls.localCheckpoint = make_capturing(original)  # type: ignore[method-assign]
    try:
        yield captured
    finally:
        for cls, original in originals.items():
            cls.localCheckpoint = original  # type: ignore[method-assign]
