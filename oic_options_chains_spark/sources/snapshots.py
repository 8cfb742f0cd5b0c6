"""Versioned snapshot sink (SURVEY.md K5 analog): the reference pushes a
per-day Dolt commit after each export (reference: dump-dolt.rkt:92-93,
145-146 — ``dolt add``/``dolt commit -m <date>``/``dolt push``). A Spark
stack gets the same story from a snapshot-addressed directory layout plus
a tiny JSON manifest: every commit is a full immutable copy addressed by
snapshot id, the manifest is the commit log, and "checkout" is reading
one snapshot directory.

This is deliberately a minimal seam: on a production deployment the same
call sites bind to a table format's native snapshot commit (Delta/Iceberg
time travel), which adds file-level dedup between versions. The layout
here keeps the ENGINE story complete — export, commit, list, read-back,
replay-idempotent — without requiring a table-format dependency.

Scale notes: data writes are ordinary partitioned parquet writes (fully
distributed); only the manifest touch is driver-side, and it is O(number
of snapshots), written atomically via rename so a crashed commit never
corrupts the log. Concurrent commits to the SAME snapshot dir are out of
scope (single-writer discipline, like the warehouse appends).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST.json"


def _manifest_path(snap_dir: str) -> str:
    return os.path.join(snap_dir, MANIFEST)


def list_snapshots(snap_dir: str) -> list[dict]:
    """The commit log, oldest first."""
    path = _manifest_path(snap_dir)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)


def _write_manifest(snap_dir: str, entries: list[dict]) -> None:
    fd, tmp = tempfile.mkstemp(dir=snap_dir, prefix="._manifest")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(entries, f, indent=2)
        os.replace(tmp, _manifest_path(snap_dir))  # atomic on POSIX
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def commit_snapshot(
    df: DataFrame,
    snap_dir: str,
    snapshot_id: str,
    message: str = "",
    committed_at: str | None = None,
) -> dict:
    """Write ``df`` as snapshot ``snapshot_id`` and append the commit to
    the manifest. Replaying a day is idempotent like the reference's
    re-commit of the same date: the data dir is overwritten and the
    existing manifest entry is updated in place, never duplicated.

    The manifest entry records the row count (one distributed count —
    the reference's commit message carried only the date; the count is
    the recon anchor a restore can verify against)."""
    os.makedirs(snap_dir, exist_ok=True)
    data_dir = os.path.join(snap_dir, f"snapshot_id={snapshot_id}")
    # checkpoint first in case df reads a previous version of this path
    staged = df.localCheckpoint(eager=True)
    n = staged.count()
    staged.write.mode("overwrite").parquet(data_dir)
    entry = {
        "snapshot_id": snapshot_id,
        "message": message,
        "rows": n,
        "committed_at": committed_at
        or dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds"),
    }
    entries = [e for e in list_snapshots(snap_dir) if e["snapshot_id"] != snapshot_id]
    entries.append(entry)
    entries.sort(key=lambda e: e["snapshot_id"])
    _write_manifest(snap_dir, entries)
    return entry


def read_snapshot(
    spark: SparkSession, snap_dir: str, snapshot_id: str | None = None
) -> DataFrame:
    """Read one committed snapshot (default: the latest by id). Reading
    an uncommitted or unknown id is an error — the manifest, not the
    filesystem, is the source of truth (a crashed write leaves data
    files but no manifest entry, and must stay invisible)."""
    entries = list_snapshots(snap_dir)
    if not entries:
        raise FileNotFoundError(f"no snapshots committed under {snap_dir}")
    ids = [e["snapshot_id"] for e in entries]
    if snapshot_id is None:
        snapshot_id = ids[-1]
    if snapshot_id not in ids:
        raise FileNotFoundError(f"snapshot {snapshot_id!r} not in manifest {ids}")
    return spark.read.parquet(os.path.join(snap_dir, f"snapshot_id={snapshot_id}"))
