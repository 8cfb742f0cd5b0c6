"""The --all-options passthrough (reference:
transform-load.2025-08-19.rkt:147-152): skipping nearest-selection must
keep EVERY raw chain row, and adding the flag must not perturb the
default selection path."""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.pipelines.chains import build_chain
from oic_options_chains_spark.sources.registry import load_table


def test_passthrough_keeps_every_exploded_row(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # the full chain's PK universe: every distinct (symbol, expiry, strike)
    # in the raw rows, times the two sides
    pk_rows = (
        li.select(
            (F.col("l_suppkey") % 100).alias("symbol_key"),
            F.col("l_shipdate").cast("date").alias("expiry"),
            F.col("l_quantity").cast("decimal(10,2)").alias("strike"),
        )
        .distinct()
        .count()
    )
    full = build_chain(spark, sf_dir, deterministic=True, all_options=True)
    assert full.count() == 2 * pk_rows

    # no expiry got dropped: the passthrough covers every raw shipdate
    raw_expiries = li.select(F.col("l_shipdate").cast("date")).distinct().count()
    assert full.select("expiry").distinct().count() == raw_expiries


def test_default_path_unchanged(spark, sf_dir):
    default = build_chain(spark, sf_dir, deterministic=True)
    explicit = build_chain(spark, sf_dir, deterministic=True, all_options=False)
    assert sorted(map(tuple, default.collect())) == sorted(
        map(tuple, explicit.collect())
    )
    # the selected chain is a strict subset of the passthrough
    full = build_chain(spark, sf_dir, deterministic=True, all_options=True)
    assert default.join(
        full, on=["symbol_key", "expiry", "strike", "call_put"], how="left_anti"
    ).count() == 0
