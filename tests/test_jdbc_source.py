"""S4 JDBC source wrapper: option construction + the registered-DataFrame
fallback seam (no database ships in this environment, so the live path is
exercised only up to option building)."""

from __future__ import annotations

import pytest

from oic_options_chains_spark.pipelines.universe import load_holdings, symbol_universe
from oic_options_chains_spark.sources.jdbc import jdbc_options, jdbc_or_registered

URL = "jdbc:postgresql://localhost:5432/local"


def test_basic_options():
    opts = jdbc_options(URL, "spdr.etf_holding", user="u", password="p")
    assert opts["url"] == URL
    assert opts["dbtable"] == "spdr.etf_holding"
    assert opts["user"] == "u" and opts["password"] == "p"
    assert int(opts["fetchsize"]) >= 1000  # never the driver's row-at-a-time default
    assert "partitionColumn" not in opts  # dimensions read unpartitioned


def test_partitioned_options_all_or_nothing():
    opts = jdbc_options(
        URL,
        "oic.option_chain",
        partition_column="stock_id",
        lower_bound=1,
        upper_bound=100000,
        num_partitions=32,
    )
    assert opts["partitionColumn"] == "stock_id"
    assert opts["numPartitions"] == "32"
    with pytest.raises(ValueError):
        jdbc_options(URL, "oic.option_chain", partition_column="stock_id")


def test_registered_fallback_feeds_pipeline(spark):
    holdings = spark.createDataFrame(
        [
            ("SPY", "AAA", "2024-01-02"),
            ("SPY", "BBB", "2024-01-02"),
            ("MDY", "CCC", "2024-01-01"),  # stale snapshot, dropped
        ],
        "etf_symbol string, component_symbol string, date string",
    )
    src = load_holdings(spark, jdbc_url=None, registered=holdings)
    syms = [r.symbol for r in symbol_universe(src).collect()]
    assert syms == sorted(syms)
    assert "AAA" in syms and "SPY" in syms and "CCC" not in syms


def test_missing_both_sources_raises(spark):
    with pytest.raises(ValueError, match="no JDBC url"):
        jdbc_or_registered(spark, "spdr.etf_holding")
