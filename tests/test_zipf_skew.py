"""Zipf-skew stress (VERDICT r8 item 6): the skew story — salting,
band-key boundedness, distinct-name matching — exercised against a
deterministic Zipf(1.2) fixture instead of argued.

The fixture (tools/gen_scale.zipf_variant, cached at .scale/zipf0.5) is
the sf0.5 tables with the skewable distributions redrawn heavy-tailed:
the hottest event_type carries ~49% of 500k events, the hottest user
~21%, one part name covers ~29k of 100k records, and a 20-template
Zipf pool gives documents a heavy-tailed shingle frequency profile.

Balance is asserted on REDUCER INPUTS: rows per output partition of the
exact hash exchange the operator performs (spark_partition_id over a
repartition by the shuffle key — each output partition is one reduce
task's input; the REST task-metrics API is unavailable here because
test sessions run with spark.ui.enabled=false).
"""

from __future__ import annotations

import os
import statistics

import pytest
from pyspark.sql import functions as F

ZIPF_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "zipf0.5")
SF05_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale", "sf0.5")


@pytest.fixture(scope="module")
def zipf_dir():
    if not os.path.isdir(f"{ZIPF_DIR}/events.parquet"):
        if not os.path.isdir(f"{SF05_DIR}/events.parquet"):
            pytest.skip("scale fixture .scale/sf0.5 not generated")
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(ZIPF_DIR), "..", "tools"))
        from gen_scale import zipf_variant  # type: ignore

        zipf_variant(ZIPF_DIR, SF05_DIR)
    return ZIPF_DIR


def _partition_rows(df, n_parts: int, *keys: str) -> list[int]:
    """Rows per output partition of a hash exchange on ``keys`` — the
    reduce-task input distribution of a groupBy/join keyed that way."""
    counts = (
        df.repartition(n_parts, *[F.col(k) for k in keys])
        .withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    by_pid = {r["__pid"]: r["count"] for r in counts}
    return [by_pid.get(i, 0) for i in range(n_parts)]


def _skew_ratio(rows: list[int]) -> float:
    med = statistics.median(rows)
    return max(rows) / max(med, 1)


def test_salted_agg_balances_reducer_input_under_zipf(spark, zipf_dir):
    """q_salted_agg's reason to exist: on Zipf event_type (hottest type
    ~49% of rows) the unsalted exchange hands one reducer half the
    table; the (key, salt) exchange must keep max task input <= 4x the
    median — and the answer must equal the unsalted aggregate."""
    from oic_options_chains_spark.queries import QUERIES
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, zipf_dir, "events")
    hot_share = (
        e.groupBy("event_type").count().agg(F.max("count")).collect()[0][0]
        / e.count()
    )
    assert hot_share >= 0.4, f"fixture lost its skew: {hot_share}"

    salted = e.select(
        "event_type",
        (F.crc32(F.col("event_id").cast("string")) % 16).alias("__salt"),
    )
    unsalted_rows = _partition_rows(e.select("event_type"), 8, "event_type")
    salted_rows = _partition_rows(salted, 8, "event_type", "__salt")
    assert _skew_ratio(unsalted_rows) > 4, unsalted_rows  # the problem is real
    assert _skew_ratio(salted_rows) <= 4, salted_rows  # salting fixes it

    got = {
        r["event_type"]: (r["n"], r["total_value"])
        for r in QUERIES["q_salted_agg"](spark, zipf_dir).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["tv"])
        for r in load_table(spark, zipf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(28,2)")
            .cast("string")
            .alias("tv"),
        )
        .collect()
    }
    assert got == want


def test_lsh_band_buckets_stay_bounded_under_shingle_skew(spark, zipf_dir):
    """Band keys are near-dup-bounded BY CONSTRUCTION: a Zipf template
    shared by ~half the documents makes individual shingles hot, but a
    MinHash band only collides when the whole shingle profile agrees —
    so band-bucket sizes (the LSH join's per-key work) must stay flat,
    and the reducer input of the band exchange balanced."""
    from oic_options_chains_spark.operators.minhash import (
        doc_shingles,
        minhash_band_keys,
    )
    from oic_options_chains_spark.sources.registry import load_table

    d = load_table(spark, zipf_dir, "documents")
    bands = minhash_band_keys(
        doc_shingles(d, "doc_id", "text", distinct=False), "doc_id"
    )
    band_cols = [c for c in bands.columns if c != "doc_id"]
    sizes = (
        bands.groupBy(*band_cols).count().agg(
            F.max("count").alias("mx"),
            F.percentile_approx("count", 0.5).alias("md"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
    ).collect()[0]
    # the hottest bucket is a true near-dup cluster, not a skew blowup:
    # per-bucket pairing work (size^2) must stay one executor's job
    assert sizes["mx"] <= 512, dict(sizes.asDict())
    part_rows = _partition_rows(bands, 16, *band_cols)
    assert _skew_ratio(part_rows) <= 4, part_rows


def test_entity_resolution_work_is_vocabulary_sized_under_hot_names(
    spark, zipf_dir
):
    """One part name covers ~29% of 100k records; a record-level blocked
    self-join would examine ~29k^2 pairs for that name alone. The
    distinct-name pipeline must (a) complete, (b) give every equal-name
    record the same entity, (c) do candidate work that does NOT grow
    with record duplication: the match edges computed on the full
    record table equal those computed on the (tiny) name vocabulary."""
    from oic_options_chains_spark.operators.linkage import (
        name_match_edges,
        resolve_entities,
    )
    from oic_options_chains_spark.sources.registry import load_table

    p = load_table(spark, zipf_dir, "part")
    records = p.select(
        F.col("p_partkey").alias("rec_id"), F.col("p_name").alias("name")
    )
    vocab = records.select("name").distinct()
    n_vocab = vocab.count()
    assert n_vocab < 200  # the fixture's point: tiny vocabulary, huge table

    edges_records = {
        (r.name_a, r.name_b)
        for r in name_match_edges(records, max_edit=1).collect()
    }
    edges_vocab = {
        (r.name_a, r.name_b)
        for r in name_match_edges(vocab, max_edit=1).collect()
    }
    assert edges_records == edges_vocab

    assign = resolve_entities(records, max_edit=1)
    per_name = (
        records.join(assign, "rec_id")
        .groupBy("name")
        .agg(F.countDistinct("entity_id").alias("k"))
        .agg(F.max("k"))
        .collect()[0][0]
    )
    assert per_name == 1  # equal names never split across entities


def test_hot_entity_window_completes_and_preserves_rows(spark, zipf_dir):
    """Entity-keyed windows under Zipf: one user owns ~21% of 500k
    events, so its window partition is a genuinely hot 100k-row sort.
    That skew is SEMANTIC (the window is per-user by definition) — the
    engine must absorb it: the rolling aggregate completes, emits
    exactly one row per input row, and the hot user's rows are all
    present."""
    from oic_options_chains_spark.queries import QUERIES
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, zipf_dir, "events")
    n = e.count()
    hot = (
        e.groupBy("user_id").count().orderBy(F.col("count").desc()).first()
    )
    assert hot["count"] > 0.15 * n  # the fixture's hot entity
    out = QUERIES["q_moving_avg"](spark, zipf_dir)
    assert out.count() == n
    assert (
        out.join(e.select("event_id").distinct(), "event_id").count() == n
    )
