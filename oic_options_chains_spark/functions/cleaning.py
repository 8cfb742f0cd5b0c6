"""String/sentinel cleanup helpers (SURVEY.md F1-F11, F23-F27).

These reproduce the reference's normalization semantics:

- sentinel text -> NULL (``'N/A'``/``'0.00'`` etc., reference:
  transform-load.2025-08-19.rkt:327-393)
- percent strings -> decimal fractions (strip ``[,%]`` then /100,
  reference: transform-load.2025-08-19.rkt:398-417, :203)
- code -> label enum map (``'C'``->``'Call'``, reference:
  transform-load.2025-08-19.rkt:195-198)
- vendor/DB symbol remap ``/`` <-> ``.`` (reference:
  extract.2023-11-16.rkt:169-171,244)
- OCC option-symbol regex decode (reference: transform-load.rkt:49-70).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_SENTINELS = ("N/A", "0.00")

# OCC 21-char option symbol, e.g. AAPL  240119C00190000 — reference:
# transform-load.rkt:49-56 (four capture groups).
OCC_PATTERN = r"([0-9A-Z]+)([0-9]{6})([CP])([0-9]{8})"


def sentinel_to_null(col: Column, sentinels: tuple[str, ...] = DEFAULT_SENTINELS) -> Column:
    """NULL out sentinel strings, pass everything else through (F24)."""
    return F.when(col.isin(*sentinels), F.lit(None)).otherwise(col)


def pct_decode(col: Column, out_type: str = "decimal(18,6)") -> Column:
    """Decode ``'12.34%'`` (with optional thousands commas) to 0.1234 (F3/F4)."""
    cleaned = F.regexp_replace(col, "[,%]", "")
    return (
        cleaned.cast("decimal(28,6)") * F.lit(Decimal("0.01")).cast("decimal(4,2)")
    ).cast(out_type)


def enum_map(col: Column, mapping: dict[str, str], keep_unmapped: bool = True) -> Column:
    """CASE-map codes to labels, e.g. {'C': 'Call', 'P': 'Put'} (F25/F10)."""
    expr = None
    for code, label in mapping.items():
        branch = F.when(col == code, F.lit(label))
        expr = branch if expr is None else expr.when(col == code, F.lit(label))
    assert expr is not None, "mapping must be non-empty"
    return expr.otherwise(col) if keep_unmapped else expr


def occ_symbol_parse(col: Column) -> dict[str, Column]:
    """Decode an OCC option symbol into its four fields (F1/F2/F12).

    Returns columns: underlying (string), expiration (date, yyMMdd with the
    reference's 20xx pivot), side ('C'/'P'), strike (decimal, milli-dollars
    / 1000 — reference: transform-load.rkt:70).
    """
    compact = F.regexp_replace(col, r"\s+", "")
    return {
        "underlying": F.regexp_extract(compact, OCC_PATTERN, 1),
        "expiration": F.to_date(
            F.concat(F.lit("20"), F.regexp_extract(compact, OCC_PATTERN, 2)),
            "yyyyMMdd",
        ),
        "side": F.regexp_extract(compact, OCC_PATTERN, 3),
        "strike": (
            F.regexp_extract(compact, OCC_PATTERN, 4).cast("decimal(18,3)")
            / F.lit(1000)
        ).cast("decimal(18,3)"),
    }


def symbol_db_to_vendor(col: Column) -> Column:
    """DB form -> vendor form: '.' becomes '/' (F9)."""
    return F.translate(col, ".", "/")


def symbol_vendor_to_db(col: Column) -> Column:
    """Vendor form -> DB form: '/' becomes '.' (F9)."""
    return F.translate(col, "/", ".")
