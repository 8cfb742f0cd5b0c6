"""Exact-decimal arithmetic helpers.

The reference computes in exact rationals and truncates (never rounds)
when storing: ``trunc(x, 4)`` on greeks/vols, ``trunc(bid, 2)`` on exports
(reference: transform-load.2025-08-19.rkt:49,204-208; dump-dolt.rkt:59-67).

PySpark has no ``trunc(x, n)`` for numerics: ``round`` rounds HALF_UP,
``bround`` HALF_EVEN, and a decimal cast rounds HALF_UP — all wrong for
negative greeks (theta < 0 must truncate toward zero, i.e. up). We build
truncation from ``floor``/``ceil``, which are exact on DecimalType and stay
inside whole-stage codegen.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F


def trunc_n(col: Column, n: int, out_type: str = "decimal(38,6)") -> Column:
    """Truncate toward zero at ``n`` decimal places (SURVEY.md F22).

    Equivalent to PostgreSQL ``trunc(col, n)``. Works on DecimalType input;
    pass ``out_type`` to pin the result type for oracle comparison.
    """
    scale = F.lit(Decimal(10) ** n)
    shifted = col * scale
    truncated = F.when(col >= 0, F.floor(shifted)).otherwise(F.ceil(shifted))
    return (truncated / scale).cast(out_type)


def decimal_lit(value: str, precision: int = 18, scale: int = 6) -> Column:
    """A literal pinned to DecimalType.

    Spark infers Python floats as DoubleType; the reference's strike-target
    multipliers (70/100 .. 130/100, 825/1000, 1125/1000, 1175/1000 —
    reference: transform-load.2025-08-19.rkt:114-122) must stay exact
    decimals end-to-end, so build literals from strings.
    """
    return F.lit(Decimal(value)).cast(f"decimal({precision},{scale})")
