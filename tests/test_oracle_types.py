"""Oracle OUTPUT-TYPE contract: the driver hashes both result sets through
pandas, so oracle columns must land on pandas-exact dtypes that agree with
the Spark side.

Why string-parity (test_oracle_parity.py) is not enough: DuckDB types
``SUM(BIGINT)`` as HUGEINT; pandas has no 128-bit integer, so the driver's
hasher degrades HUGEINT to float64, and any value > 2^53 silently drifts
while ``str(value)`` still matches. That exact bug shipped twice
(q_hll_distinct.sum_scaled, q_ann_ivf_kmeans.dist — red in
CORRECTNESS_r03/r04 with bit-identical values). This test executes every
registered oracle in DuckDB and fails on the whole class:

1. No HUGEINT / UHUGEINT output column, ever (pandas float64 degradation).
2. No DECIMAL output column (scale-sensitive canonicalization, the mirror
   of test_no_decimal_output_columns on the Spark side).
3. Type-CLASS parity with the Spark schema: a float-typed oracle column
   whose Spark twin is integral (or vice versa) hashes differently even
   when values agree (1 vs 1.0), so the classes must match per column.

Oracles run LIMIT 0 where possible? No — DuckDB reports result types only
after planning, and CTE-heavy oracles are cheap at sf0.001; we execute
fully to get authoritative types.
"""

from __future__ import annotations

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

# DuckDB type name -> comparison class
_DUCK_CLASS = {
    "TINYINT": "int",
    "SMALLINT": "int",
    "INTEGER": "int",
    "BIGINT": "int",
    "UTINYINT": "int",
    "USMALLINT": "int",
    "UINTEGER": "int",
    "UBIGINT": "int",
    "HUGEINT": "banned-hugeint",
    "UHUGEINT": "banned-hugeint",
    "FLOAT": "float",
    "DOUBLE": "float",
    "VARCHAR": "str",
    "BOOLEAN": "bool",
    "DATE": "date",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP WITH TIME ZONE": "timestamp",
    "BLOB": "binary",
}


def _duck_class(type_name: str) -> str:
    t = str(type_name).upper()
    if t.startswith("DECIMAL"):
        return "banned-decimal"
    if t.startswith("STRUCT"):
        return "struct"
    if t.endswith("[]") or t.startswith("LIST"):
        return "array"
    if t.startswith("MAP"):
        return "map"
    return _DUCK_CLASS.get(t, t.lower())


def _spark_class(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(
        dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return "banned-decimal"
    if isinstance(dt, T.StringType):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, T.MapType):
        return "map"
    if isinstance(dt, T.StructType):
        return "struct"
    return type(dt).__name__


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", sorted(ORACLE.keys()))
def test_oracle_output_types(name, spark, sf_dir, oracle_con):
    # The relation API reports exact DuckDB types (BIGINT vs HUGEINT);
    # the DBAPI cursor description collapses them all to 'NUMBER'.
    rel = oracle_con.sql(ORACLE[name])
    duck = [(c, _duck_class(t)) for c, t in zip(rel.columns, rel.types)]

    banned = [(c, t) for c, t in duck if t.startswith("banned-")]
    assert not banned, (
        f"{name}: oracle emits driver-hash-unsafe column types {banned} — "
        "HUGEINT degrades to float64 in pandas (values > 2^53 drift) and "
        "DECIMAL canonicalizes scale-sensitively; CAST in the oracle SQL."
    )

    sdf = QUERIES[name](spark, sf_dir)
    spark_types = {f.name: _spark_class(f.dataType) for f in sdf.schema.fields}
    duck_types = dict(duck)
    assert set(spark_types) == set(duck_types), (
        f"{name}: column sets differ {sorted(spark_types)} vs {sorted(duck_types)}"
    )
    diffs = {
        c: (spark_types[c], duck_types[c])
        for c in spark_types
        if spark_types[c] != duck_types[c]
    }
    assert not diffs, (
        f"{name}: type-class mismatch (spark, oracle) per column: {diffs} — "
        "int-vs-float columns hash differently in the driver even when "
        "values agree; align the types on both sides."
    )
