"""Explicit StructTypes for the domain data model.

Mirrors the reference warehouse DDL (reference: schema.sql:1-60) and the
raw-zone record shapes (reference: transform-load.2025-08-19.rkt:16-45,
128-142). All numeric work is DecimalType — the reference computes in exact
rationals (reference: transform-load.2025-08-19.rkt:49), so Double would
drift; stored scales follow the reference's trunc() calls
(transform-load.2025-08-19.rkt:204-208, dump-dolt.rkt:59-67).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Working decimal scale for in-flight arithmetic; stored scales are narrower.
DEC = T.DecimalType(38, 6)
DEC_PRICE = T.DecimalType(18, 3)  # bid/ask stored at 2-3 decimals
DEC_GREEK = T.DecimalType(18, 4)  # greeks/vols truncated to 4 decimals

CALL_PUT_VALUES = ("Call", "Put")  # reference: schema.sql:3-5 (enum)

# oic.option_chain — reference: schema.sql:7-27, PK :23
OPTION_CHAIN = T.StructType(
    [
        T.StructField("act_symbol", T.StringType(), False),
        T.StructField("expiration", T.DateType(), False),
        T.StructField("strike", DEC_PRICE, False),
        T.StructField("call_put", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("bid", DEC_PRICE, True),
        T.StructField("ask", DEC_PRICE, True),
        T.StructField("vol", DEC_GREEK, True),
        T.StructField("delta", DEC_GREEK, True),
        T.StructField("gamma", DEC_GREEK, True),
        T.StructField("theta", DEC_GREEK, True),
        T.StructField("vega", DEC_GREEK, True),
        T.StructField("rho", DEC_GREEK, True),
        T.StructField("model_value", DEC_PRICE, True),  # 2025-era column
    ]
)
OPTION_CHAIN_PK = ["date", "act_symbol", "expiration", "strike", "call_put"]

# oic.volatility_history — reference: schema.sql:29-51, PK :47
VOLATILITY_HISTORY = T.StructType(
    [
        T.StructField("act_symbol", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("hv_current", DEC_GREEK, True),
        T.StructField("hv_week_ago", DEC_GREEK, True),
        T.StructField("hv_month_ago", DEC_GREEK, True),
        T.StructField("hv_year_high", DEC_GREEK, True),
        T.StructField("hv_year_high_date", T.DateType(), True),
        T.StructField("hv_year_low", DEC_GREEK, True),
        T.StructField("hv_year_low_date", T.DateType(), True),
        T.StructField("iv_current", DEC_GREEK, True),
        T.StructField("iv_week_ago", DEC_GREEK, True),
        T.StructField("iv_month_ago", DEC_GREEK, True),
        T.StructField("iv_year_high", DEC_GREEK, True),
        T.StructField("iv_year_high_date", T.DateType(), True),
        T.StructField("iv_year_low", DEC_GREEK, True),
        T.StructField("iv_year_low_date", T.DateType(), True),
    ]
)
VOLATILITY_HISTORY_PK = ["act_symbol", "date"]

# oic.weekly — reference: schema.sql:53-60, PK :58 (SCD-0 upsert target)
WEEKLY = T.StructType(
    [
        T.StructField("act_symbol", T.StringType(), False),
        T.StructField("effective_date", T.DateType(), False),
        T.StructField("last_seen", T.DateType(), False),
    ]
)
WEEKLY_PK = ["act_symbol"]

# Raw per-strike chain record (one JSON object carries both sides) —
# reference: transform-load.2025-08-19.rkt:128-142 and the REST column list
# at extract.2023-11-16.rkt:184-185. FIXTURES.md section 1.1.
CHAIN_RAW = T.StructType(
    [
        T.StructField("act_symbol", T.StringType(), False),
        T.StructField("expirationdate", T.StringType(), False),
        T.StructField("strike", DEC_PRICE, False),
        T.StructField("call_optionsymbol", T.StringType(), True),
        T.StructField("put_optionsymbol", T.StringType(), True),
        T.StructField("call_bid", DEC_PRICE, True),
        T.StructField("call_ask", DEC_PRICE, True),
        T.StructField("call_theoprice", DEC, True),
        T.StructField("call_ivint", DEC, True),
        T.StructField("call_delta", DEC, True),
        T.StructField("call_gamma", DEC, True),
        T.StructField("call_theta", DEC, True),
        T.StructField("call_vega", DEC, True),
        T.StructField("call_rho", DEC, True),
        T.StructField("put_bid", DEC_PRICE, True),
        T.StructField("put_ask", DEC_PRICE, True),
        T.StructField("put_theoprice", DEC, True),
        T.StructField("put_ivint", DEC, True),
        T.StructField("put_delta", DEC, True),
        T.StructField("put_gamma", DEC, True),
        T.StructField("put_theta", DEC, True),
        T.StructField("put_vega", DEC, True),
        T.StructField("put_rho", DEC, True),
    ]
)

# ohlc mark-price input — FIXTURES.md section 1.6, reference:
# transform-load.2025-08-19.rkt:104-113 (as-of close lookup).
OHLC = T.StructType(
    [
        T.StructField("act_symbol", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
        T.StructField("close", DEC_PRICE, False),
    ]
)

# etf_holding universe input — FIXTURES.md section 1.5, reference:
# extract.rkt:73-108.
ETF_HOLDING = T.StructType(
    [
        T.StructField("etf_symbol", T.StringType(), False),
        T.StructField("component_symbol", T.StringType(), False),
        T.StructField("date", T.DateType(), False),
    ]
)
