"""K5 versioned snapshot sink: commit/list/read-back/replay semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from oic_options_chains_spark.sources.snapshots import (
    commit_snapshot,
    list_snapshots,
    read_snapshot,
)


@pytest.fixture()
def snap_dir(tmp_path):
    return str(tmp_path / "snapshots")


def _df(spark, rows):
    return spark.createDataFrame(rows, "act_symbol string, px double")


def test_commit_list_read_latest(spark, snap_dir):
    commit_snapshot(_df(spark, [("A", 1.0)]), snap_dir, "2024-01-02", "daily")
    commit_snapshot(_df(spark, [("A", 2.0), ("B", 3.0)]), snap_dir, "2024-01-03")
    log = list_snapshots(snap_dir)
    assert [e["snapshot_id"] for e in log] == ["2024-01-02", "2024-01-03"]
    assert [e["rows"] for e in log] == [1, 2]
    latest = read_snapshot(spark, snap_dir)
    assert latest.count() == 2
    old = read_snapshot(spark, snap_dir, "2024-01-02")
    assert [r.px for r in old.collect()] == [1.0]


def test_recommit_same_day_is_replay_not_duplicate(spark, snap_dir):
    commit_snapshot(_df(spark, [("A", 1.0)]), snap_dir, "2024-01-02")
    commit_snapshot(_df(spark, [("A", 9.0)]), snap_dir, "2024-01-02")
    log = list_snapshots(snap_dir)
    assert len(log) == 1 and log[0]["rows"] == 1
    assert [r.px for r in read_snapshot(spark, snap_dir).collect()] == [9.0]


def test_unknown_snapshot_raises(spark, snap_dir):
    commit_snapshot(_df(spark, [("A", 1.0)]), snap_dir, "2024-01-02")
    with pytest.raises(FileNotFoundError, match="not in manifest"):
        read_snapshot(spark, snap_dir, "2023-12-31")
    with pytest.raises(FileNotFoundError, match="no snapshots"):
        read_snapshot(spark, snap_dir + "_missing")


def test_snapshot_roundtrip_from_export_projection(spark, sf_dir, snap_dir):
    # the real export path: projection -> commit -> read-back identical
    from oic_options_chains_spark.queries import QUERIES

    df = QUERIES["q_export_projection"](spark, sf_dir)
    entry = commit_snapshot(df, snap_dir, "2024-01-05", "export")
    back = read_snapshot(spark, snap_dir, "2024-01-05")
    assert back.count() == entry["rows"] == df.count()
    assert sorted(back.columns) == sorted(df.columns)


def test_schema_evolution_across_days(spark, tmp_path):
    # A column added by a later day's load: merge_schema=True surfaces it
    # across the whole table with NULLs for the days written before it —
    # the scan-side ALTER TABLE ADD COLUMN.
    from oic_options_chains_spark.sources.warehouse import append_day, read_table

    tdir = str(tmp_path / "tbl")
    d1 = spark.createDataFrame(
        [("2024-01-01", 1, 10)], "date string, k bigint, a bigint"
    ).withColumn("date", F.col("date").cast("date"))
    append_day(spark, tdir, d1, ["k"])
    d2 = spark.createDataFrame(
        [("2024-01-02", 2, 20, "x")], "date string, k bigint, a bigint, b string"
    ).withColumn("date", F.col("date").cast("date"))
    append_day(spark, tdir, d2, ["k"])

    merged = read_table(spark, tdir, merge_schema=True)
    assert "b" in merged.columns
    rows = {r["k"]: r["b"] for r in merged.collect()}
    assert rows[1] is None and rows[2] == "x"


def test_snapshot_diff_between_committed_versions(spark, tmp_path):
    # The release workflow end-to-end: commit v1, commit v2, read both
    # back through the manifest, and classify every key with the CDC
    # diff — the Dolt "what changed between these two commits" question.
    from oic_options_chains_spark.operators.cdc import snapshot_diff
    from oic_options_chains_spark.sources.snapshots import (
        commit_snapshot,
        read_snapshot,
    )

    snap = str(tmp_path / "snaps")
    v1 = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "k bigint, payload string"
    )
    v2 = spark.createDataFrame(
        [(2, "beta"), (3, "GAMMA"), (4, "delta")], "k bigint, payload string"
    )
    commit_snapshot(v1, snap, "2024-01-01")
    commit_snapshot(v2, snap, "2024-01-02")

    old = read_snapshot(spark, snap, "2024-01-01").select(
        "k", F.md5("payload").alias("fp")
    )
    new = read_snapshot(spark, snap, "2024-01-02").select(
        "k", F.md5("payload").alias("fp")
    )
    got = {r["k"]: r["status"] for r in snapshot_diff(old, new, "k").collect()}
    assert got == {1: "removed", 2: "kept", 3: "changed", 4: "added"}
