"""Symbol-universe pipeline: the reference's daily extraction query
(reference: extract.rkt:73-108; extract.2023-11-16.rkt:126-173;
SURVEY.md U1/P6/P7/P8/J1/O3, traced in section 3.1 steps 4-5).

Universe = (distinct components of the S&P SPDR ETFs at the latest
holdings snapshot) UNION (the ETF symbols themselves), optionally range-
restricted for resumable extraction, ordered by symbol. The vendor map
intersects that universe with the vendor's lookup directory under the
``/`` <-> ``.`` symbol remap and yields symbol -> stockId.

Scale: holdings snapshots are tiny dimensions; the latest-snapshot filter
is an aggregate broadcast back onto the scan (one pass), the union dedups
map-side, and the vendor intersection is a broadcast semi-join — nothing
here shuffles more than kilobytes at any plausible universe size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oic_options_chains_spark.functions.cleaning import symbol_vendor_to_db
from oic_options_chains_spark.sources.jdbc import jdbc_or_registered

# reference: extract.rkt:79
DEFAULT_ETFS = ("SPY", "MDY", "SLY", "SPSM")


def load_holdings(
    spark: SparkSession,
    jdbc_url: str | None = None,
    table: str = "spdr.etf_holding",
    registered: DataFrame | None = None,
    **jdbc_kwargs,
) -> DataFrame:
    """Holdings source (S4): live ``spark.read.jdbc`` against the
    warehouse when a URL is configured (the reference queries Postgres,
    extract.2023-11-16.rkt:126-161), a registered DataFrame otherwise.
    Holdings are a tiny dimension — no partitioning options needed; the
    latest-snapshot filter pushes into the remote query as a WHERE."""
    return jdbc_or_registered(
        spark, table, jdbc_url=jdbc_url, registered=registered, **jdbc_kwargs
    )


def latest_snapshot(holdings: DataFrame, etfs: Sequence[str] = DEFAULT_ETFS) -> DataFrame:
    """Holdings rows at the latest date (P8's scalar subquery as an
    aggregate cross-joined back — broadcast, one scan each side)."""
    scoped = holdings.filter(F.col("etf_symbol").isin(*etfs))
    max_date = scoped.agg(F.max("date").alias("__max_date"))
    return scoped.join(
        F.broadcast(max_date), on=F.col("date") == F.col("__max_date")
    ).drop("__max_date")


def symbol_universe(
    holdings: DataFrame,
    etfs: Sequence[str] = DEFAULT_ETFS,
    first_symbol: str | None = None,
    last_symbol: str | None = None,
) -> DataFrame:
    """One ``symbol`` column, distinct, ordered. The optional resume range
    reproduces the reference's ``case when $1 != '' ...`` CLI predicates
    (P6) — built conditionally in Python so unset bounds never reach the
    plan."""
    latest = latest_snapshot(holdings, etfs)
    components = latest.select(F.col("component_symbol").alias("symbol"))
    etf_syms = latest.select(F.col("etf_symbol").alias("symbol"))
    universe = components.union(etf_syms).distinct()
    if first_symbol:
        universe = universe.filter(F.col("symbol") >= first_symbol)
    if last_symbol:
        universe = universe.filter(F.col("symbol") <= last_symbol)
    return universe.orderBy("symbol")


def vendor_symbol_map(universe: DataFrame, lookup: DataFrame) -> DataFrame:
    """(symbol, stock_id) for universe symbols present in the vendor
    lookup directory (J1): the vendor spells ``BRK.B`` as ``BRK/B``, so
    the join key is the remapped DB form."""
    keyed = lookup.select(
        symbol_vendor_to_db(F.col("vendor_symbol")).alias("symbol"),
        F.col("stock_id"),
    )
    return keyed.join(F.broadcast(universe), on="symbol", how="inner")
