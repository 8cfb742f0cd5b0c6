"""Golden legacy chains-page fixture builder (2019/2022 eras).

Reproduces the layout transform-load.rkt:98-131 walks: numbered tables
(mark price in table 5, chains grid in table 9), option rows with the
OCC symbol in an anchor's onmouseover and nine positional span cells per
side (call at offset 0, put at offset -1)."""

from __future__ import annotations

MARKER = "Implied Volatility is suggested by"

# call-side 1-based td positions (put side shifts left by one)
_OCC_TD, _TDS = 3, {"bid": 5, "ask": 6, "vol": 10, "delta": 11,
                    "gamma": 12, "theta": 13, "vega": 15, "rho": 16}


def occ(symbol: str, yymmdd: str, side: str, strike: float) -> str:
    return f"{symbol} {yymmdd}{side}{int(round(strike * 1000)):08d}"


def _option_row(symbol: str, yymmdd: str, side: str, strike: float, vals: dict) -> str:
    offset = 0 if side == "C" else -1
    cells = [""] * 16
    cells[_OCC_TD + offset - 1] = (
        f'<span><a onmouseover="show(\'{occ(symbol, yymmdd, side, strike)}\')">o</a></span>'
    )
    for field, td in _TDS.items():
        cells[td + offset - 1] = f"<span>{vals[field]}</span>"
    return "<tr>" + "".join(f"<td>{c}</td>" for c in cells) + "</tr>"


DEFAULT_VALS = {
    "bid": "1.25", "ask": "1.35", "vol": "34.56%", "delta": "0.5432",
    "gamma": "0.0123", "theta": "-0.05678", "vega": "0.2345", "rho": "0.0456",
}


def build_chains_page(
    era_name: str,
    symbol: str = "AAA",
    mark: str = "100.00",
    expiries: tuple[str, ...] = ("220615",),
    strikes: tuple[float, ...] = (100.0,),
    vals: dict | None = None,
) -> str:
    vals = vals or DEFAULT_VALS
    filler = "<table><tr><td>x</td></tr></table>"
    mark_table = f"<table><tr><td>h</td></tr><tr><td>{mark}</td><td>x</td></tr></table>"
    grids = []
    for e in expiries:
        rows = "".join(
            _option_row(symbol, e, side, s, vals)
            for s in strikes
            for side in ("C", "P")
        )
        grids.append(f"<tr><td><table>{rows}</table></td></tr>")
    chains_table = "<table>" + "".join(grids) + "</table>"
    tables = [filler] * 4 + [mark_table] + [filler] * 3 + [chains_table]
    body = "".join(tables)
    if era_name == "2019":
        body = f"<table><tr><td>{body}</td></tr></table>"
    return f"<html><body><p>{MARKER} the market.</p>{body}</body></html>"
