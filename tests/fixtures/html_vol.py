"""Golden HTML fixture builder for the volatility kernel tests.

Pages are built per era to match the positional layouts the reference
sxpath-walks (transform-load.2025-08-19.rkt:252-260 current;
transform-load.rkt:152-162 legacy; outer paths per variant file). Values
are parameterized so tests can pin exact expectations.
"""

from __future__ import annotations

FILLER_ROW = "<tr><td>x</td><td>x</td><td>x</td><td>x</td><td>x</td><td>x</td></tr>"


def _grid(rows: list[str]) -> str:
    return "<table>" + "".join(rows) + "</table>"


def _legacy_grid(hv: dict, iv: dict) -> str:
    def row(label: str, d: dict) -> str:
        return (
            f"<tr><td>{label}</td><td>{d['current']}</td>"
            f"<td>{d['week_ago']}</td><td>{d['month_ago']}</td>"
            f"<td>{d['year_high']}</td><td>{d['year_low']}</td></tr>"
        )

    return _grid(
        [FILLER_ROW] * 4 + [row("Historical Volatility", hv)]
        + [FILLER_ROW] * 3 + [row("Implied Volatility", iv)]
    )


def _current_grid(hv: dict, iv: dict) -> str:
    # year_low cell carries two text segments; the kernel must take the
    # SECOND (sxpath `third`, transform-load.2025-08-19.rkt:255).
    def row(label: str, d: dict) -> str:
        return (
            f"<tr><td>{label}</td><td>{d['current']}</td>"
            f"<td>{d['week_ago']}</td><td>{d['year_high']}</td>"
            f"<td>{d['month_ago']}<br>{d['year_low']}</td></tr>"
        )

    return _grid(
        [FILLER_ROW] * 4 + [row("Historical Volatility", hv)]
        + [FILLER_ROW] * 3 + [row("Implied Volatility", iv)]
    )


DEFAULT_HV = {
    "current": "45.678%",
    "week_ago": "43.21%",
    "month_ago": "40.00%",
    "year_high": "58.90% - 05-Aug",
    "year_low": "12.34% - 12-Mar",
}
DEFAULT_IV = {
    "current": "30.11%",
    "week_ago": "29.99%",
    "month_ago": "28.00%",
    "year_high": "66.60% - 05-Sep",
    "year_low": "0.00% - N/A",
}

MARKER = "Implied Volatility is suggested by"


def build_page(era_name: str, hv: dict | None = None, iv: dict | None = None) -> str:
    hv = hv or DEFAULT_HV
    iv = iv or DEFAULT_IV
    legacy = era_name in ("2019", "2022-04-29")
    grid = _legacy_grid(hv, iv) if legacy else _current_grid(hv, iv)
    host = f"<table><tr><td>{grid}</td></tr></table>"
    junk = "<table><tr><td>nav&nbsp;junk</td></tr></table>"
    marker = f"<p>{MARKER} the market.</p>" if legacy else ""
    if era_name == "2019":
        # html body table tr td (table LAST): grid host nested in outer table
        body = f"<table><tr><td>{junk}</td><td>{host}</td></tr></table>"
    elif era_name == "2022-04-29":
        # html body (table LAST): grid host is the last top-level table
        body = junk + host
    elif era_name == "2023-11-16":
        # html body table tr td (table 2): 2nd table nested in outer table
        body = f"<table><tr><td>{junk}{host}</td></tr></table>"
    else:
        # html body (table 2): grid host is the 2nd top-level table
        body = junk + host
    return f"<html><body>{marker}{body}</body></html>"
