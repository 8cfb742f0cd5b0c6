"""Flagship composite: the reference's daily chain transform re-expressed
over the synthetic tables (reference: transform-load.2025-08-19.rkt:103-152,
traced in SURVEY.md section 3.2).

Shape: as-of mark price (J2) -> decimal strike/expiry targets (F20/F15) ->
nearest expiry then nearest strike selection (J3/J4) -> wide->long side
explode (F29) -> PK dedup (K1). One of every hard operator class, all in
a single declarative plan Catalyst can optimize end-to-end.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from oic_options_chains_spark.functions.literals import values_df
from oic_options_chains_spark.operators.asof import latest_per_key
from oic_options_chains_spark.operators.dedup import dedup_by_key
from oic_options_chains_spark.operators.nearest import (
    nearest_date_selection,
    nearest_selection,
)
from oic_options_chains_spark.sources.registry import load_table

SNAPSHOT = dt.date(1998, 6, 30)
# +2/+4/+6/+8 weeks, as the reference's expiry targets
# (transform-load.2025-08-19.rkt:123-126).
WEEK_OFFSETS = (14, 28, 42, 56)
# A slice of the reference's 27 rational strike-target multipliers
# (transform-load.2025-08-19.rkt:114-122) — exact decimals.
STRIKE_MULTIPLIERS = ("0.70", "0.825", "1.00", "1.125", "1.30")


def build_chain(
    spark: SparkSession,
    sf_dir: str,
    deterministic: bool = False,
    all_options: bool = False,
) -> DataFrame:
    """Returns an option_chain-shaped DataFrame from the synthetic tables.

    Stand-ins (FIXTURES.md section 2): customer = symbol universe, orders =
    ohlc (as-of price), lineitem = raw chain rows keyed by shipdate
    (expiration) and quantity (strike).

    ``deterministic=True`` resolves PK collisions with min(px) instead of
    the reference-faithful arbitrary-winner conflict-ignore (its PK index
    kept whichever row arrived first) so the result is oracle-hashable.

    ``all_options=True`` is the reference's ``--all-options`` passthrough
    (transform-load.2025-08-19.rkt:147-152, the ``(if (all-options?)
    all-options ...)`` branch): the nearest-expiry/nearest-strike
    selection is skipped entirely and every raw chain row flows to the
    side explode + PK resolution. The selection plan (as-of marks,
    targets, argmin joins) is never even constructed — at scale the
    passthrough is a straight partitioned scan."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")

    if all_options:
        kept = li.select(
            (F.col("l_suppkey") % 100).alias("symbol_key"),
            F.col("l_shipdate").cast("date").alias("expiry"),
            F.col("l_quantity").cast("decimal(10,2)").alias("strike"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("bid"),
            F.col("l_tax").cast("decimal(18,2)").alias("ask"),
        )
        return _explode_and_resolve(kept, deterministic)

    # 1. As-of mark price per "symbol" (custkey), J2/W1.
    marks = latest_per_key(
        orders.filter(F.col("o_orderdate") <= F.lit(SNAPSHOT).cast("timestamp")),
        ["o_custkey"],
        "o_orderdate",
        tiebreak=["o_orderkey"],
    ).select(
        F.col("o_custkey").alias("symbol_key"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("mark_price"),
    )

    # 2. Expiry targets: nearest distinct shipdate to each +2k-week target.
    dates = li.select(F.col("l_shipdate").cast("date").alias("expiry")).distinct()
    targets = values_df(
        spark,
        "target_date",
        [SNAPSHOT + dt.timedelta(days=d) for d in WEEK_OFFSETS],
        "date",
    )
    expiry_winners = nearest_date_selection(
        dates, [], "expiry", targets, "target_date"
    ).select("target_date", "expiry")

    # 3. Strike targets: mark_price x rational multipliers, exact decimal —
    #    scaled into the quantity domain (1..50) for the synthetic tables.
    mults = values_df(
        spark, "mult", [Decimal(m) for m in STRIKE_MULTIPLIERS], "decimal(6,4)"
    )
    strike_targets = (
        marks.crossJoin(F.broadcast(mults))
        .select(
            "symbol_key",
            (
                (F.col("mark_price") * F.col("mult"))
                % F.lit(Decimal("50.00")).cast("decimal(10,2)")
            )
            .cast("decimal(10,2)")
            .alias("target_strike"),
        )
        .distinct()
    )

    # 4. Candidate strikes per symbol at the winning expirations.
    #    NOTE on the multi-scan plan: the strikes-distinct and kept-rows
    #    consumers each re-scan the fact table with THEIR pruned column
    #    sets (3 cols vs 5). Pinning a shared exchange was measured
    #    slower — column pruning makes the narrow re-scan cheaper than
    #    one wide reused shuffle, and at warehouse scale the date filter
    #    prunes both scans to one partition anyway.
    chains = (
        li.join(
            F.broadcast(expiry_winners),
            on=F.col("l_shipdate").cast("date") == F.col("expiry"),
        )
        .select(
            (F.col("l_suppkey") % 100).alias("symbol_key"),
            "expiry",
            F.col("l_quantity").cast("decimal(10,2)").alias("strike"),
            F.col("l_extendedprice").cast("decimal(18,2)").alias("bid"),
            F.col("l_tax").cast("decimal(18,2)").alias("ask"),
        )
    )
    strikes = chains.select("symbol_key", "expiry", "strike").distinct()

    # Per (symbol, expiry, target) argmin via the nearest_selection operator
    # with targets carrying the group key.
    per_symbol_targets = strike_targets.withColumn(
        "symbol_key", F.col("symbol_key") % 100
    ).distinct()
    winners = nearest_selection(
        strikes,
        ["symbol_key", "expiry"],
        "strike",
        per_symbol_targets,
        "target_strike",
    ).select("symbol_key", "expiry", F.col("strike").alias("win_strike"))

    # 5. Keep full rows at winning strikes; explode into Call/Put sides;
    #    PK dedup absorbs overlapping target winners (K1).
    w = winners.select(
        F.col("symbol_key").alias("w_symbol_key"),
        F.col("expiry").alias("w_expiry"),
        "win_strike",
    ).distinct()
    kept = chains.join(
        w,
        on=[
            chains["symbol_key"] == w["w_symbol_key"],
            chains["expiry"] == w["w_expiry"],
            chains["strike"] == w["win_strike"],
        ],
    ).select(chains["symbol_key"], chains["expiry"], chains["strike"], "bid", "ask")

    return _explode_and_resolve(kept, deterministic)


def _explode_and_resolve(kept: DataFrame, deterministic: bool) -> DataFrame:
    """Shared tail: wide->long side explode (F29) + PK resolution (K1)."""
    sides = F.array(
        F.struct(F.lit("Call").alias("call_put"), F.col("bid").alias("px")),
        F.struct(F.lit("Put").alias("call_put"), F.col("ask").alias("px")),
    )
    long = kept.select(
        "symbol_key", "expiry", "strike", F.explode(sides).alias("s")
    ).select(
        "symbol_key",
        "expiry",
        "strike",
        F.col("s.call_put").alias("call_put"),
        F.col("s.px").alias("px"),
    )
    pk = ["symbol_key", "expiry", "strike", "call_put"]
    if deterministic:
        return long.groupBy(*pk).agg(F.min("px").alias("px"))
    return dedup_by_key(long, pk)
