"""Round 15: the ADVICE r14 fixes.

- bench gate (tools/bench_commit.py): violation messages carry the RAW
  cur/base ratio next to the floored one, and a sub-second key whose
  raw ratio exceeds 2x while the floored gate passes surfaces as a
  non-fatal note — the 0.5 s floor decides red/green but no longer
  hides what it absorbs (a 0.1 s -> 1.2 s blowup used to print as
  '2.4', and 0.1 s -> 0.9 s printed as nothing at all).
- _check_band_index_params: DISTINCT over the meta columns instead of
  a first-row peek, so an index accidentally assembled from MIXED
  bandings (a union of two epoch artifacts) raises at entry instead of
  silently never joining half its band keys.
- streaming_minhash_candidate_screen(pin_dir=...): the widened base
  index can be pinned to reliable storage (parquet) instead of
  localCheckpoint executor blocks, surviving executor loss on a real
  cluster; candidates are identical either way.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tools.bench_commit import gate

_PAD = {f"q_pad{i}": 1.0 for i in range(20)}


def _gate_for(tmp_path, monkeypatch, base, cur, notes=None):
    (tmp_path / "BASELINE_BENCH.json").write_text(json.dumps({"queries": base}))
    detail = tmp_path / "BENCH_DETAIL.json"
    detail.write_text(json.dumps({"queries": cur}))
    import tools.bench_commit as bc

    monkeypatch.setattr(bc, "REPO", str(tmp_path))
    return gate(str(detail), notes=notes)


def test_gate_violation_reports_raw_ratio(tmp_path, monkeypatch):
    """A genuine sub-second blowup (0.1 -> 1.2 s) reds AND shows the
    raw 12x, not just the floored 2.4x."""
    problems = _gate_for(
        tmp_path, monkeypatch, dict(_PAD, q_tiny=0.1), dict(_PAD, q_tiny=1.2)
    )
    assert any("2.40x" in p and "raw 12.00x" in p for p in problems), problems


def test_gate_sub_second_drift_surfaces_as_note(tmp_path, monkeypatch):
    """0.1 -> 0.9 s passes the floored gate (green) but is 9x raw —
    visible in notes, absent from problems."""
    notes: list[str] = []
    problems = _gate_for(
        tmp_path,
        monkeypatch,
        dict(_PAD, q_tiny=0.1),
        dict(_PAD, q_tiny=0.9),
        notes=notes,
    )
    assert problems == []
    assert len(notes) == 1 and "q_tiny" in notes[0] and "raw 9.00x" in notes[0]


def test_gate_no_note_when_clean(tmp_path, monkeypatch):
    notes: list[str] = []
    problems = _gate_for(tmp_path, monkeypatch, _PAD, dict(_PAD), notes=notes)
    assert problems == [] and notes == []


# ---------------------------------------------------------------------------


@pytest.fixture()
def corpus(spark):
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    base = spark.createDataFrame(
        [
            (i, f"{words} doc {i} tail " + " ".join(["pad"] * (i % 5)))
            for i in range(40)
        ],
        ["doc_id", "text"],
    )
    delta = base.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    return base, delta


def test_mixed_banding_union_raises_at_entry(spark, tmp_path, corpus):
    """The ADVICE r14 hole: a union of two epoch artifacts with
    different bandings used to pass the first-row meta check while half
    its band keys could never join."""
    from oic_options_chains_spark.operators.minhash import (
        incremental_lsh_dedup,
        materialize_epoch_band_index,
    )

    base, delta = corpus
    p84 = str(tmp_path / "idx84")
    p82 = str(tmp_path / "idx82")
    materialize_epoch_band_index(base, p84, num_hashes=8, rows_per_band=4)
    materialize_epoch_band_index(base, p82, num_hashes=8, rows_per_band=2)
    mixed = spark.read.parquet(p84).unionByName(spark.read.parquet(p82))
    with pytest.raises(ValueError, match="mixed bandings"):
        incremental_lsh_dedup(base, delta, base_index=mixed)


# ---------------------------------------------------------------------------

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _run_screen(spark, tmp_path, tag, delta_rows, base_index, **kwargs):
    from oic_options_chains_spark.streaming.neardup_screen_stream import (
        streaming_minhash_candidate_screen,
    )

    src = tmp_path / f"src_{tag}"
    src.mkdir()
    out = str(tmp_path / f"out_{tag}")
    ckpt = str(tmp_path / f"ckpt_{tag}")
    (src / "f0.json").write_text(
        "\n".join(json.dumps(r) for r in delta_rows)
    )
    stream = spark.readStream.schema(_SCHEMA).json(str(src))
    q = (
        streaming_minhash_candidate_screen(stream, base_index, **kwargs)
        .writeStream.format("parquet")
        .option("path", out)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "availableNow drain exceeded 300s"
    return {
        (r.delta_id, r.base_id) for r in spark.read.parquet(out).collect()
    }


def test_pin_dir_candidates_match_local_checkpoint(spark, tmp_path, corpus):
    from oic_options_chains_spark.operators.minhash import (
        materialize_epoch_band_index,
    )

    base, delta = corpus
    idx_path = str(tmp_path / "idx")
    materialize_epoch_band_index(base, idx_path)
    idx = spark.read.parquet(idx_path)
    delta_rows = [
        {"doc_id": r.doc_id, "text": r.text} for r in delta.collect()
    ]
    pin = str(tmp_path / "widened")
    got_pin = _run_screen(
        spark, tmp_path, "pin", delta_rows, idx, pin_dir=pin
    )
    got_local = _run_screen(spark, tmp_path, "local", delta_rows, idx)
    assert got_pin == got_local and got_pin
    # the pin is a real reliable-storage artifact, not a side effect
    assert any(f.endswith(".parquet") for f in os.listdir(pin))
