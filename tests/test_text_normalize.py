"""normalize_web_text folding/deletion/collapse behavior (operators/text.py).

Escapes, not literals, for every non-ASCII character — same rule as the
operator source.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.text import normalize_web_text


def _norm(spark, s: str) -> str:
    df = spark.createDataFrame([(s,)], "t string")
    return df.select(normalize_web_text(F.col("t")).alias("n")).first()["n"]


def test_typographic_folds(spark):
    s = "\u201chi\u201d \u2018x\u2019 a\u2013b c\u2014d 1\u22122"
    assert _norm(spark, s) == '"hi" \'x\' a-b c-d 1-2'


def test_invisibles_deleted_and_spaces_folded(spark):
    s = "a\u200b\u200c\u200d\u2060\ufeff\u00adb c d e\u3000f"
    assert _norm(spark, s) == "ab c d e f"


def test_ellipsis_and_whitespace_collapse(spark):
    assert _norm(spark, "  wait\u2026 \t\n what  ") == "wait... what"


def test_idempotent(spark):
    s = "\u201cKa\u00adfka\u201d \u2014 draft\u2026"
    once = _norm(spark, s)
    assert _norm(spark, once) == once
