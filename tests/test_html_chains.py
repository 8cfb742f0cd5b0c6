"""Legacy HTML chains kernel (X2) + end-to-end legacy chain_day_html."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from oic_options_chains_spark.parse.eras import ERAS
from oic_options_chains_spark.parse.html_chains import parse_chain_rows
from tests.fixtures.html_chains import build_chains_page

ERA_BY_NAME = {e.name: e for e in ERAS}
INGEST = dt.date(2022, 6, 1)  # 2022 era: +2/+4/+8 weeks
EXPIRIES = ("220615", "220630", "220727")  # near the three targets
DECOY_EXPIRY = "230101"
STRIKES = (50.0, 70.0, 82.5, 100.0, 112.5, 130.0, 200.0)
WINNING = {Decimal(s) for s in ("70", "82.5", "100", "112.5", "130")}


@pytest.mark.parametrize("era_name", ["2019", "2022-04-29"])
def test_kernel_extracts_both_sides(era_name):
    rows = parse_chain_rows(
        build_chains_page(era_name, expiries=("220615",), strikes=(100.0,)),
        ERA_BY_NAME[era_name],
    )
    assert len(rows) == 2  # one call + one put row
    call = next(r for r in rows if "C00100000" in r["occ"])
    put = next(r for r in rows if "P00100000" in r["occ"])
    for r in (call, put):
        assert r["mark_price"] == "100.00"
        assert r["bid"] == "1.25"
        assert r["vol_pct"] == "34.56%"
        assert r["theta"] == "-0.05678"


def test_chain_day_html_end_to_end(spark, tmp_path):
    from oic_options_chains_spark.pipelines.chains_raw import chain_day_html

    day = tmp_path / INGEST.isoformat()
    day.mkdir()
    (day / "AAA.html").write_text(
        build_chains_page(
            "2022-04-29", expiries=EXPIRIES + (DECOY_EXPIRY,), strikes=STRIKES
        )
    )
    (day / "BAD.html").write_text("<html>No Options found</html>")

    out = chain_day_html(spark, str(tmp_path), INGEST).cache()
    rows = out.collect()
    # 3 winning expirations x 5 winning strikes x 2 sides
    assert len(rows) == 30
    assert {r.expiration.isoformat() for r in rows} == {
        "2022-06-15", "2022-06-30", "2022-07-27"
    }
    assert {r.strike for r in rows} == {s.quantize(Decimal("0.001")) for s in WINNING}
    call = next(r for r in rows if r.call_put == "Call")
    assert call.vol == Decimal("0.3456")  # '34.56%' -> /100
    assert call.theta == Decimal("-0.0567")  # trunc toward zero
    assert call.model_value is None  # era predates theoprice
    assert call.date == INGEST


def test_chain_day_html_all_options(spark, tmp_path):
    from oic_options_chains_spark.pipelines.chains_raw import chain_day_html

    day = tmp_path / INGEST.isoformat()
    day.mkdir()
    (day / "AAA.html").write_text(
        build_chains_page("2022-04-29", expiries=EXPIRIES, strikes=STRIKES)
    )
    out = chain_day_html(spark, str(tmp_path), INGEST, all_options=True)
    assert out.count() == len(EXPIRIES) * len(STRIKES) * 2
