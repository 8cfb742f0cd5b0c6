"""Golden tests for the HTML volatility kernel (X1) + era dispatch.

Mirrors the reference's five-parser-era drift (SURVEY.md section 0): each
era's fixture page reproduces that era's table layout; the kernel must
find the same ten cells the sxpath walk found.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pytest

from oic_options_chains_spark.parse.eras import ERAS, era_for_date
from oic_options_chains_spark.parse.html_vol import parse_history_cells
from tests.fixtures.html_vol import DEFAULT_HV, DEFAULT_IV, build_page

ERA_BY_NAME = {e.name: e for e in ERAS}


def test_era_dispatch_boundaries():
    assert era_for_date(dt.date(2020, 6, 1)).name == "2019"
    assert era_for_date(dt.date(2022, 4, 29)).name == "2022-04-29"
    assert era_for_date(dt.date(2023, 11, 15)).name == "2022-04-29"
    assert era_for_date(dt.date(2023, 11, 16)).name == "2023-11-16"
    assert era_for_date(dt.date(2024, 12, 31)).name == "2024-04-26"
    assert era_for_date(dt.date(2026, 1, 1)).name == "2025-08-19"


@pytest.mark.parametrize("era_name", list(ERA_BY_NAME))
def test_kernel_finds_cells_per_era(era_name):
    era = ERA_BY_NAME[era_name]
    cells = parse_history_cells(build_page(era_name), era)
    assert cells["hv_current"] == DEFAULT_HV["current"]
    assert cells["hv_week_ago"] == DEFAULT_HV["week_ago"]
    assert cells["hv_year_high"] == DEFAULT_HV["year_high"]
    assert cells["hv_year_low"] == DEFAULT_HV["year_low"]
    assert cells["iv_current"] == DEFAULT_IV["current"]
    assert cells["iv_year_low"] == DEFAULT_IV["year_low"]
    if era.history_grid == "legacy":
        assert cells["hv_month_ago"] == DEFAULT_HV["month_ago"]
        assert cells["iv_month_ago"] == DEFAULT_IV["month_ago"]
    else:
        assert cells["hv_month_ago"] is None
        assert cells["iv_month_ago"] is None


def test_kernel_raises_on_layout_mismatch():
    era = ERA_BY_NAME["2025-08-19"]
    with pytest.raises(Exception):
        parse_history_cells("<html><body><p>not a chain page</p></body></html>", era)


def test_vol_history_end_to_end(spark, tmp_path):
    from oic_options_chains_spark.pipelines.volatility import (
        vol_history,
        vol_history_quarantine,
    )

    ingest = dt.date(2025, 8, 19)
    day = tmp_path / ingest.isoformat()
    day.mkdir()
    (day / "AAA.html").write_text(build_page("2025-08-19"))
    (day / "BAD.html").write_text("<html>No Options found</html>")
    (day / "BROKEN.html").write_text("<html><body><table></table></body></html>")

    out = vol_history(spark, str(tmp_path), ingest).orderBy("act_symbol")
    rows = out.collect()
    assert [r.act_symbol for r in rows] == ["AAA"]
    r = rows[0]
    assert r.date == ingest
    assert r.hv_current == Decimal("0.4567")  # 45.678% truncated, not rounded
    assert r.hv_week_ago == Decimal("0.4321")
    assert r.hv_month_ago is None  # current era skips month-ago
    assert r.hv_year_high == Decimal("0.5890")
    assert r.hv_year_high_date == dt.date(2025, 8, 5)
    assert r.hv_year_low == Decimal("0.1234")
    assert r.hv_year_low_date == dt.date(2025, 3, 12)
    assert r.iv_year_high == Decimal("0.6660")
    # 05-Sep lands after the snapshot -> prior year (F18)
    assert r.iv_year_high_date == dt.date(2024, 9, 5)
    assert r.iv_year_low is None  # 0.00% sentinel
    assert r.iv_year_low_date is None

    quarantined = vol_history_quarantine(spark, str(tmp_path), ingest).collect()
    assert [q.act_symbol for q in quarantined] == ["BROKEN"]
    assert "Error" in quarantined[0].parse_error or ":" in quarantined[0].parse_error


def test_vol_history_legacy_era(spark, tmp_path):
    from oic_options_chains_spark.pipelines.volatility import vol_history

    ingest = dt.date(2022, 6, 1)
    day = tmp_path / ingest.isoformat()
    day.mkdir()
    (day / "LEG.html").write_text(build_page("2022-04-29"))
    # legacy eras REQUIRE the marker: a page without it is skipped
    (day / "NOMARK.html").write_text(
        build_page("2022-04-29").replace("Implied Volatility is suggested by", "")
    )

    rows = vol_history(spark, str(tmp_path), ingest).collect()
    assert [r.act_symbol for r in rows] == ["LEG"]
    r = rows[0]
    assert r.hv_month_ago == Decimal("0.4000")  # legacy grid parses month-ago
    assert r.hv_year_high_date == dt.date(2021, 8, 5)  # 05-Aug vs 2022-06-01
