"""Source/sink format matrix: every built-in columnar/text format the
engine can round-trip without extra packages (parquet is the default
everywhere else in the suite; this pins ORC, JSON-lines, and CSV too,
so a deployment choosing a different lake format has a tested path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _sample(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            "l_returnflag",
            F.col("l_shipdate").cast("date").alias("ship_date"),
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .limit(500)
    )


def _sorted_rows(df):
    return [tuple(r) for r in df.orderBy("l_orderkey", "l_linenumber").collect()]


@pytest.mark.parametrize("fmt", ["orc", "parquet", "json"])
def test_columnar_and_jsonl_roundtrip(spark, sf_dir, tmp_path, fmt):
    df = _sample(spark, sf_dir)
    path = str(tmp_path / fmt)
    df.write.format(fmt).save(path)
    back = spark.read.format(fmt).load(path)
    if fmt == "json":
        # JSON is schemaless on read: restore types before comparing
        back = back.select(
            F.col("l_orderkey").cast("bigint"),
            F.col("l_linenumber").cast("int"),
            F.col("l_quantity").cast(dict(df.dtypes)["l_quantity"]),
            "l_returnflag",
            F.col("ship_date").cast("date"),
            F.col("cents").cast("bigint"),
        )
        back = back.toDF(*df.columns)
    assert _sorted_rows(back) == _sorted_rows(df)


def test_orc_predicate_pushdown_reaches_scan(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    path = str(tmp_path / "orc_pd")
    df.write.format("orc").save(path)
    q = spark.read.format("orc").load(path).filter(F.col("l_orderkey") == 1)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_orderkey" in plan.split("PushedFilters")[1][:120]


def test_csv_roundtrip_with_header_and_dates(spark, sf_dir, tmp_path):
    df = _sample(spark, sf_dir)
    path = str(tmp_path / "csv")
    df.write.option("header", True).csv(path)
    back = (
        spark.read.option("header", True)
        .schema(df.schema)
        .csv(path)
    )
    assert _sorted_rows(back) == _sorted_rows(df)
