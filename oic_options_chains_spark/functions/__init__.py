"""Scalar column helpers (SURVEY.md section 2.8).

Everything here is a composition of built-in ``pyspark.sql.functions`` —
JVM-side, whole-stage-codegen friendly. No Python UDFs.
"""

from oic_options_chains_spark.functions.cleaning import (
    enum_map,
    occ_symbol_parse,
    pct_decode,
    sentinel_to_null,
    symbol_db_to_vendor,
    symbol_vendor_to_db,
)
from oic_options_chains_spark.functions.dates import prior_year_date
from oic_options_chains_spark.functions.decimal_ops import trunc_n

__all__ = [
    "trunc_n",
    "prior_year_date",
    "sentinel_to_null",
    "pct_decode",
    "enum_map",
    "occ_symbol_parse",
    "symbol_db_to_vendor",
    "symbol_vendor_to_db",
]
