"""Mixed-era raw-zone e2e (VERDICT r6 item 6): one ingest day per parser
era in a single raw zone, each day driven through the era-dispatched
chain build, asserting the per-era semantic differences — chain format
(HTML scrape vs JSON REST), 27-vs-23-vs-denser strike-target sets, the
2025-only +6-week expiry target, and model_value presence — actually
materialize per date partition. The per-era golden tests pin each
parser alone; only this test catches a cross-era DISPATCH regression
(e.g. era_for_date boundary drift feeding a 2024 file to the 2025
parser).

Reference parity: the five dated transform-load variants
(transform-load.rkt, .2022-04-29, .2023-11-16, .2024-04-26,
.2025-08-19) selected by the shell driver's date — see parse/eras.py.
"""

from __future__ import annotations

import datetime as dt
import json
from decimal import Decimal

import pytest

from oic_options_chains_spark.parse.eras import ERAS, era_for_date
from oic_options_chains_spark.schemas import OHLC
from tests.fixtures.html_chains import build_chains_page
from tests.test_chains_raw import _row

# One ingest date squarely inside each era.
DAYS = {
    "2019": dt.date(2019, 6, 3),
    "2022-04-29": dt.date(2022, 6, 1),
    "2023-11-16": dt.date(2023, 12, 4),
    "2024-04-26": dt.date(2024, 6, 3),
    "2025-08-19": dt.date(2025, 8, 19),
}

ERA_BY_NAME = {e.name: e for e in ERAS}

# Strike grid = the union of every era's multiplier x a mark of 100, so
# each era's nearest-strike argmin hits its OWN target set exactly and
# the winner set per day equals that era's multipliers verbatim.
ALL_STRIKES = sorted(
    {float(Decimal(m) * 100) for e in ERAS for m in e.strike_multipliers}
)


def _era_winning_strikes(era_name: str) -> set[Decimal]:
    return {
        (Decimal(m) * 100).quantize(Decimal("0.001"))
        for m in ERA_BY_NAME[era_name].strike_multipliers
    }


def _expiries(ingest: dt.date) -> list[dt.date]:
    # all four candidate offsets every day; only 2025 TARGETS +6
    return [ingest + dt.timedelta(weeks=w) for w in (2, 4, 6, 8)]


@pytest.fixture(scope="module")
def mixed_zone(tmp_path_factory):
    base = tmp_path_factory.mktemp("mixed_eras")
    for era_name, ingest in DAYS.items():
        day = base / ingest.isoformat()
        day.mkdir()
        exps = _expiries(ingest)
        if ERA_BY_NAME[era_name].chain_format == "html":
            (day / "AAA.html").write_text(
                build_chains_page(
                    era_name,
                    expiries=tuple(e.strftime("%y%m%d") for e in exps),
                    strikes=tuple(ALL_STRIKES),
                )
            )
        else:
            rows = [
                _row(e.isoformat(), str(s)) for e in exps for s in ALL_STRIKES
            ]
            (day / "AAA.json").write_text(json.dumps(rows))
    return str(base)


@pytest.fixture(scope="module")
def ohlc_all_days(spark):
    # an as-of close of 100 the day before each JSON-era ingest
    rows = [
        ("AAA", ingest - dt.timedelta(days=1), Decimal("100.000"))
        for ingest in DAYS.values()
    ]
    return spark.createDataFrame(rows, OHLC)


def _build_day(spark, zone, ohlc, ingest: dt.date):
    from oic_options_chains_spark.pipelines.chains_raw import (
        chain_day,
        chain_day_html,
    )

    era = era_for_date(ingest)
    if era.chain_format == "html":
        return era, chain_day_html(spark, zone, ingest)
    return era, chain_day(spark, zone, ohlc, ingest)


def test_mixed_era_zone_dispatches_all_five_eras(
    spark, mixed_zone, ohlc_all_days
):
    picked = {era_for_date(d).name for d in DAYS.values()}
    assert picked == set(DAYS), "each day must land in a distinct era"

    by_era = {}
    for era_name, ingest in DAYS.items():
        era, df = _build_day(spark, mixed_zone, ohlc_all_days, ingest)
        assert era.name == era_name
        by_era[era_name] = df.collect()

    for era_name, rows in by_era.items():
        ingest = DAYS[era_name]
        era = ERA_BY_NAME[era_name]
        assert rows, f"{era_name}: empty chain"
        # every row lands in its own date partition
        assert {r.date for r in rows} == {ingest}

        # expiry targets: +6 weeks materializes ONLY in the 2025 era
        expiries = {r.expiration for r in rows}
        expected_exp = {
            ingest + dt.timedelta(weeks=w) for w in era.week_offsets
        }
        assert expiries == expected_exp, era_name
        n_exp = 4 if era_name == "2025-08-19" else 3
        assert len(expiries) == n_exp, era_name

        # strike winners == that era's multiplier set exactly
        strikes = {r.strike for r in rows}
        assert strikes == _era_winning_strikes(era_name), era_name

        # model_value (theoprice) exists only in the 2025 era
        n_model = sum(r.model_value is not None for r in rows)
        assert (n_model > 0) == era.has_model_value, era_name

        # both sides of every winning (expiration, strike)
        assert len(rows) == len(expiries) * len(strikes) * 2, era_name


def test_mixed_era_strike_set_discriminators(spark, mixed_zone, ohlc_all_days):
    """The concrete 23-vs-27 deltas the eras are ABOUT: 72.5 (the 0.725
    multiplier) wins through 2023 but is dropped by the 2024 trim; the
    2025 densification adds 97/99/101/103 that no earlier era selects."""
    _, d2023 = _build_day(spark, mixed_zone, ohlc_all_days, DAYS["2023-11-16"])
    _, d2024 = _build_day(spark, mixed_zone, ohlc_all_days, DAYS["2024-04-26"])
    _, d2025 = _build_day(spark, mixed_zone, ohlc_all_days, DAYS["2025-08-19"])
    s2023 = {r.strike for r in d2023.collect()}
    s2024 = {r.strike for r in d2024.collect()}
    s2025 = {r.strike for r in d2025.collect()}
    q = lambda s: Decimal(s).quantize(Decimal("0.001"))  # noqa: E731
    assert q("72.5") in s2023 and q("77.5") in s2023
    assert q("72.5") not in s2024 and q("77.5") not in s2024
    assert {q("97"), q("99"), q("101"), q("103")} <= s2025
    assert not ({q("97"), q("99")} & s2024)
    assert len(s2023) == 27 and len(s2024) == 23 and len(s2025) == 27
