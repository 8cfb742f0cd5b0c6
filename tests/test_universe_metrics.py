"""Tests for the symbol-universe pipeline (U1/P6/P7/P8/J1) and observed
reconciliation counters (A5/T5)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from oic_options_chains_spark.schemas import ETF_HOLDING

OLD, NEW = dt.date(2025, 8, 1), dt.date(2025, 8, 15)


def _holdings(spark):
    rows = [
        ("SPY", "AAPL", NEW), ("SPY", "MSFT", NEW), ("MDY", "AAPL", NEW),
        ("MDY", "BRK.B", NEW), ("SPSM", "ZEBRA", NEW),
        ("SPY", "GONE", OLD),              # stale snapshot: excluded
        ("XLE", "XOM", NEW),               # non-universe ETF: excluded
    ]
    return spark.createDataFrame(rows, ETF_HOLDING)


def test_symbol_universe(spark):
    from oic_options_chains_spark.pipelines.universe import symbol_universe

    syms = [r.symbol for r in symbol_universe(_holdings(spark)).collect()]
    # components at the latest snapshot + the ETF symbols, distinct, sorted
    assert syms == ["AAPL", "BRK.B", "MDY", "MSFT", "SPSM", "SPY", "ZEBRA"]

    resumed = symbol_universe(_holdings(spark), first_symbol="MSFT")
    assert [r.symbol for r in resumed.collect()] == ["MSFT", "SPSM", "SPY", "ZEBRA"]


def test_vendor_symbol_map(spark):
    from oic_options_chains_spark.pipelines.universe import (
        symbol_universe,
        vendor_symbol_map,
    )

    lookup = spark.createDataFrame(
        [("AAPL", 11), ("BRK/B", 22), ("OTHER", 33)],
        "vendor_symbol string, stock_id int",
    )
    got = {
        r.symbol: r.stock_id
        for r in vendor_symbol_map(symbol_universe(_holdings(spark)), lookup).collect()
    }
    # vendor BRK/B matches DB BRK.B; non-universe vendor rows drop out
    assert got == {"AAPL": 11, "BRK.B": 22}


def test_observed_counts(spark, tmp_path):
    from oic_options_chains_spark.operators.metrics import observed_counts

    df = spark.range(100).withColumn(
        "parse_error", F.when(F.col("id") % 10 == 0, F.lit("boom"))
    )
    flagged, obs = observed_counts(
        df, {"failed": F.col("parse_error").isNotNull()}
    )
    flagged.write.mode("overwrite").parquet(str(tmp_path / "out"))
    assert obs.get == {"rows": 100, "failed": 10}


def test_quality_report_counts_violations(spark):
    from oic_options_chains_spark.operators.validate import quality_report

    df = spark.createDataFrame(
        [
            (1, 1, 10, "A"),
            (1, 1, 99, "A"),   # dup key + range violation
            (2, 1, None, "X"), # null qty (range counts NULL) + bad enum
            (3, 1, 50, "N"),
        ],
        "k bigint, ln bigint, qty bigint, flag string",
    )
    got = {r["check"]: (r["n_violations"], r["n_checked"])
           for r in quality_report(
               df,
               not_null=["qty"],
               ranges=[("qty", 1, 50)],
               enums=[("flag", ["A", "N", "R"])],
               unique=["k", "ln"],
           ).collect()}
    assert got["not_null:qty"] == (1, 4)
    assert got["range:qty[1,50]"] == (2, 4)   # 99 out of range + NULL
    assert got["enum:flag"] == (1, 4)
    assert got["unique:k,ln"] == (1, 4)
