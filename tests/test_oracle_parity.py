"""Replicates the driver's t2 gate locally: run every registered Spark
query and its DuckDB oracle on the same parquet tables and compare
row-count, column names, and order-insensitive values.

Comparison mirrors the driver contract (__spark_entry__.py): columns are
sorted by name, rows sorted by their full value tuple, values compared
exactly after normalizing to strings (dates ISO, decimals as emitted —
scale differences are real mismatches, by design).
"""

from __future__ import annotations

import datetime as dt
import decimal
import math

import duckdb
import pytest

# full-registry gate: ~minutes per suite. The FULL profile (default,
# what the driver and CI run) includes these; the fast inner loop is
#   python -m pytest tests/ -m 'not parity'
pytestmark = pytest.mark.parity

from oic_options_chains_spark.queries import ORACLE, QUERIES

from tests.conftest import SF_DIR

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _norm(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, dt.datetime):
        return v.isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def _canon(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return cols, data


@pytest.fixture(scope="session")
def oracle_con():
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        # .scale-style fixtures (tools/gen_scale.py) write each table as
        # a DIRECTORY of part-files — glob those; the driver's tables
        # are single files. Spark reads both shapes transparently.
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    return con


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_oracle_parity(name, spark, sf_dir, oracle_con):
    sdf = QUERIES[name](spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    res = oracle_con.execute(ORACLE[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    s_cols, s_data = _canon(spark_cols, [tuple(r) for r in spark_rows])
    d_cols, d_data = _canon(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_data) == len(d_data), (
        f"{name}: row count {len(s_data)} vs {len(d_data)}"
    )
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_data, d_data)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_all_queries_have_unique_names():
    assert len(QUERIES) == len(set(QUERIES))
    # every oracle key corresponds to a query
    assert set(ORACLE) <= set(QUERIES)


def test_no_decimal_output_columns(spark, sf_dir):
    """Driver-contract guard: the driver's order-insensitive value hash
    canonicalizes decimals scale-insensitively (Decimal('40.00') != 40.0),
    so a DecimalType in a FINAL output schema is a latent hash mismatch
    whenever a value carries trailing zeros. Every registered query must
    stringify (or float) decimal outputs; internal plans stay decimal."""
    from pyspark.sql.types import DecimalType

    offenders = {}
    for name, fn in QUERIES.items():
        schema = fn(spark, sf_dir).schema
        bad = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
        if bad:
            offenders[name] = bad
    assert not offenders, f"decimal output columns break the driver hash: {offenders}"
