"""Build-once parquet materialization keyed by SOURCE IDENTITY — the
"epoch index" serving shape (VERDICT r12 item 2, generalized round 13).

Incremental screens (aHash media dedup, MinHash text dedup) bucket-join
each incoming delta batch against an index of the base corpus. That
index is a pure function of the corpus, so at scale it is built once
per epoch and READ thereafter — re-deriving it per batch re-hashes the
whole corpus every time, which is exactly the cost incremental
operators exist to avoid. This module is the build-once plumbing the
registered queries use to serve that shape on file-backed testdata:

- :func:`source_identity` fingerprints a parquet file (or directory of
  part files) by absolute path + size + mtime_ns, so a REGENERATED
  corpus re-materializes and an unchanged one never re-builds;
- :func:`epoch_parquet` returns the cached relation for (tag,
  identity), invoking the caller's ``build(tmp_path)`` exactly once
  per identity. Concurrent builders race benignly: each writes a
  unique temp directory and the loser of the atomic ``os.rename``
  discards its copy. The cache can only ever change WHEN work happens,
  never WHAT a query returns — oracles recompute the index contents
  from raw data and still value-match.

Cache root: ``$SPARK_GRAFT_CACHE_DIR`` or ``<repo>/.cache``
(gitignored).
"""

from __future__ import annotations

import hashlib
import os
import shutil
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def source_identity(path: str) -> str:
    """Fingerprint of a data source file or directory: per-entry name,
    size and mtime_ns. Content hashing would be exact but costs a full
    read per query construction; (size, mtime_ns) changes whenever the
    generators here rewrite a table."""
    if os.path.isdir(path):
        st = [
            (n, os.stat(os.path.join(path, n)))
            for n in sorted(os.listdir(path))
            if not n.startswith((".", "_"))
        ]
        return ";".join(f"{n}:{s.st_size}:{s.st_mtime_ns}" for n, s in st)
    s = os.stat(path)
    return f"{s.st_size}:{s.st_mtime_ns}"


def epoch_dir(src_path: str, tag: str, build: Callable[[str], None]) -> str:
    """The cache DIRECTORY for ``(tag, identity(src_path))`` — built via
    ``build(tmp_path)`` on first use (the callback may lay out anything
    under that path: one parquet table, or several subdirectories for a
    multi-relation artifact like an IVF-PQ index), atomically renamed
    into place afterwards. ``tag`` must encode every parameter the
    built contents depend on (operator version, slice predicate, band
    widths, ...): two different parameterizations over the same source
    need two tags."""
    sig = hashlib.md5(
        f"{tag}:{os.path.abspath(src_path)}:{source_identity(src_path)}".encode()
    ).hexdigest()[:16]
    root = os.environ.get("SPARK_GRAFT_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".cache",
    )
    final = os.path.join(root, "epoch", sig)
    if not os.path.isdir(final):
        os.makedirs(os.path.dirname(final), exist_ok=True)
        tmp = f"{final}.build-{uuid.uuid4().hex[:8]}"
        try:
            build(tmp)
        except BaseException:
            # a failed build must not leave a half-written temp dir (it
            # would never be read, only accumulate) — and must surface
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        try:
            os.rename(tmp, final)
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
            # only a concurrent-builder race is benign (the winner's
            # copy is in place, identical contents — the build is a
            # pure function of (tag, source)). Any other rename failure
            # (read-only cache root, build that never created tmp)
            # must surface here, not as a confusing
            # path-does-not-exist from the eventual parquet read.
            if not os.path.isdir(final):
                raise
    return final


def epoch_parquet(
    spark: SparkSession,
    src_path: str,
    tag: str,
    build: Callable[[str], None],
) -> DataFrame:
    """The materialized epoch relation for ``(tag, identity(src_path))``
    — ``build(tmp_path)`` must write one parquet table there; every
    call returns it as a plain parquet scan."""
    return spark.read.parquet(epoch_dir(src_path, tag, build))
