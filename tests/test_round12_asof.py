"""asof_join_union hardening (ADVICE r11 item 2): carry-struct type is
built as a StructType (not a DDL string), so carry column names that
need quoting survive; carry/left name collisions raise instead of
silently duplicating output columns."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.asof import asof_join_union


def _t(s):
    return dt.datetime.fromisoformat(s)


def test_carry_column_names_needing_quoting_survive(spark):
    left = spark.createDataFrame(
        [(1, _t("2024-01-02T00:00:00"))], "k long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, _t("2024-01-01T00:00:00"), 9.5)],
        "k long, rts timestamp, px double",
    ).select(
        "k",
        "rts",
        F.col("px").alias("px mid, quote:usd"),  # space, comma, colon
    )
    out = asof_join_union(left, right, on=["k"], left_time="ts", right_time="rts")
    rows = out.collect()
    assert rows[0]["px mid, quote:usd"] == 9.5
    assert set(out.columns) == {"k", "ts", "px mid, quote:usd"}


def test_carry_collision_with_left_column_raises(spark):
    left = spark.createDataFrame(
        [(1, _t("2024-01-02T00:00:00"), "x")], "k long, ts timestamp, px string"
    )
    right = spark.createDataFrame(
        [(1, _t("2024-01-01T00:00:00"), 9.5)],
        "k long, rts timestamp, px double",
    )
    with pytest.raises(ValueError, match="collide.*px"):
        asof_join_union(left, right, on=["k"], left_time="ts", right_time="rts")
