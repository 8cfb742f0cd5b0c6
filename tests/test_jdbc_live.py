"""LIVE JDBC round-trip against embedded Derby (ships in Spark's own
classpath) — the S4 reader path executed through a REAL JDBC driver, not
the registered-DataFrame fallback: DriverManager connection, Spark JDBC
scan, bounds-partitioned parallel read, predicate pushdown into the
remote query, and a Spark-side write-back. The wire-protocol Postgres
binding (reference extract.2023-11-16.rkt:124-161) differs only by URL
and driver jar; everything this exercises — option plumbing, partition
clause generation, filter pushdown — is the shared code path."""

from __future__ import annotations

import pytest

from oic_options_chains_spark.sources.jdbc import jdbc_or_registered, read_jdbc

ROWS = [(0, "AAPL", 1.5), (1, "MSFT", 2.5), (2, "BRK.B", 0.5), (3, "GOOG", 3.0)]


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "holdings_db"
    url = f"jdbc:derby:{db}"
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url + ";create=true")
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE holdings (id INT NOT NULL, symbol VARCHAR(10), weight DOUBLE)"
    )
    for i, s, w in ROWS:
        st.execute(f"INSERT INTO holdings VALUES ({i}, '{s}', {w})")
    conn.close()
    return url


def test_live_read_roundtrip(spark, derby_url):
    df = read_jdbc(spark, derby_url, "holdings")
    got = sorted((r.ID, r.SYMBOL, r.WEIGHT) for r in df.collect())
    assert got == sorted(ROWS)


def test_bounds_partitioned_read_is_parallel_and_complete(spark, derby_url):
    df = read_jdbc(
        spark,
        derby_url,
        "holdings",
        partition_column="id",
        lower_bound=0,
        upper_bound=4,
        num_partitions=2,
    )
    assert df.rdd.getNumPartitions() == 2
    # stride partitioning must neither drop nor duplicate boundary rows
    assert sorted((r.ID, r.SYMBOL, r.WEIGHT) for r in df.collect()) == sorted(ROWS)


def test_filter_pushes_into_the_remote_query(spark, derby_url):
    df = read_jdbc(spark, derby_url, "holdings").filter("weight > 1.0")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "WEIGHT" in plan
    assert {r.SYMBOL for r in df.collect()} == {"AAPL", "MSFT", "GOOG"}


def test_jdbc_or_registered_takes_the_live_path(spark, derby_url):
    df = jdbc_or_registered(spark, "holdings", jdbc_url=derby_url)
    assert df.count() == len(ROWS)


def test_write_back_appends_through_the_driver(spark, derby_url):
    """Writes go to a DEDICATED table: the module-scoped fixture's
    'holdings' contents are asserted exactly by the read tests, so
    mutating it would make this module execution-order-dependent."""
    extra = spark.createDataFrame(
        [(0, "AMD", 1.0), (9, "NVDA", 4.0)], "id int, symbol string, weight double"
    )
    (
        extra.write.format("jdbc")
        .option("url", derby_url)
        .option("dbtable", "holdings_wb")
        .mode("append")
        .save()
    )
    back = read_jdbc(spark, derby_url, "holdings_wb")
    # Spark's JDBC writer QUOTES its lowercase column names, so Derby
    # preserves them (the fixture's unquoted DDL was uppercased)
    assert sorted((r.id, r.symbol, r.weight) for r in back.collect()) == [
        (0, "AMD", 1.0),
        (9, "NVDA", 4.0),
    ]
