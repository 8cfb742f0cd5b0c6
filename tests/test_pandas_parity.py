"""Pandas-path parity: compare every query against its oracle AFTER
both results pass through pandas conversion — the route the driver's
value hasher actually takes.

Why this exists: test_oracle_parity.py compares string-normalized
values and missed the r03/r04 HUGEINT bug, where both engines printed
identical integers but DuckDB's HUGEINT degraded to float64 in pandas
and values > 2^53 drifted. test_oracle_types.py locks the TYPE classes;
this suite locks the VALUES as pandas sees them — the closest local
replica of the driver's t2 gate, catching any conversion-layer
divergence (dtype degradation, None/NaN asymmetry, array cell
representation) that engine-side comparison can't."""

from __future__ import annotations

import math

import duckdb
import pytest

# full-registry gate: ~minutes per suite. The FULL profile (default,
# what the driver and CI run) includes these; the fast inner loop is
#   python -m pytest tests/ -m 'not parity'
pytestmark = [pytest.mark.parity, pytest.mark.full]

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


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _cell(v):
    import datetime as dt

    import pandas as pd

    if v is None or v is pd.NaT:
        # Spark's null timestamp arrives as None, DuckDB's as NaT —
        # the same SQL NULL either way
        return "<NULL>"
    if isinstance(v, (list, tuple)):
        return tuple(_cell(x) for x in v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        # DuckDB hands DATE columns to pandas as midnight datetime64;
        # Spark hands them as datetime.date. The TYPE gate
        # (test_oracle_types) already proves the classes agree, so a
        # naive-midnight datetime normalizes to its date — making the
        # two pandas representations of the same DATE value compare
        # equal without masking any real time-of-day divergence.
        if v.tzinfo is None and v.time() == dt.time(0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar -> python
        return _cell(v.item())
    if hasattr(v, "tolist"):  # numpy array cell
        return tuple(_cell(x) for x in v.tolist())
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _canon(pdf):
    cols = sorted(pdf.columns)
    rows = [
        tuple(_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=repr)


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_pandas_parity(name, spark, sf_dir, oracle_con):
    import pandas as pd  # noqa: F401

    s_cols, s_rows = _canon(QUERIES[name](spark, sf_dir).toPandas())
    d_cols, d_rows = _canon(oracle_con.sql(ORACLE[name]).df())
    assert s_cols == d_cols, f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: rows {len(s_rows)} vs {len(d_rows)}"
    )
    bad = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b
    ]
    assert not bad, f"{name}: first pandas-path mismatches {bad[:3]}"
