"""Parser-version dispatch by ingest date.

The reference kept five dated transform-load variants as the upstream
site's format drifted (reference file inventory, SURVEY.md section 0);
the variant is chosen by which file the shell driver invokes. Here the
same history is a data-driven dispatch: ``era_for_date`` maps an ingest
date to the :class:`Era` whose parameters reproduce that variant.

Parameters per era (all cited from the reference):

- chain format: HTML scrape pre-2023-11-16, JSON REST after
  (transform-load.rkt:98 vs transform-load.2023-11-16.rkt:113-118).
- strike-target multipliers: 27 rationals in 2019/2022/2023 eras
  (transform-load.rkt:109-115), 23 in 2024 (transform-load.2024-04-26.rkt:
  113-118), 27 again (denser near-the-money) in 2025
  (transform-load.2025-08-19.rkt:114-122). Exact decimals, never floats.
- expiry-target week offsets: +2/+4/+8 weeks until 2025 adds +6
  (transform-load.2025-08-19.rkt:123-126).
- history-grid layout: legacy parses month-ago and one-text-segment
  year cells (transform-load.rkt:152-162); current eras skip month-ago
  and read year-low from the second text segment
  (transform-load.2025-08-19.rkt:252-260).
- leap-year hack ("29-Feb" -> "28-Feb") exists from the 2023 era on
  (transform-load.2023-11-16.rkt:229-232; absent transform-load.rkt:133).
- bad-page markers: all eras skip 'No Options found' / 'SEARCH RESULTS' /
  'Server too busy. Try it later.'; HTML eras additionally REQUIRE the
  'Implied Volatility is suggested by' marker (transform-load.rkt:230-234
  vs transform-load.2023-11-16.rkt:286-288).
- model_value (theoprice) column exists only in the 2025 era
  (transform-load.2025-08-19.rkt:30,200).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass


@dataclass(frozen=True)
class Era:
    name: str
    start: dt.date  # first ingest date this era applies to (inclusive)
    chain_format: str  # 'html' | 'json'
    strike_multipliers: tuple[str, ...]  # exact decimal strings
    week_offsets: tuple[int, ...]
    history_grid: str  # 'legacy' | 'current'
    leap_hack: bool
    require_marker: bool
    has_model_value: bool


_M_2019 = (
    "0.70", "0.725", "0.75", "0.775", "0.80", "0.825", "0.85", "0.875",
    "0.90", "0.92", "0.94", "0.96", "0.98", "1.00", "1.02", "1.04",
    "1.06", "1.08", "1.10", "1.125", "1.15", "1.175", "1.20", "1.225",
    "1.25", "1.275", "1.30",
)
_M_2024 = (
    "0.70", "0.75", "0.80", "0.825", "0.85", "0.875", "0.90", "0.92",
    "0.94", "0.96", "0.98", "1.00", "1.02", "1.04", "1.06", "1.08",
    "1.10", "1.125", "1.15", "1.175", "1.20", "1.25", "1.30",
)
_M_2025 = (
    "0.70", "0.75", "0.80", "0.825", "0.85", "0.875", "0.90", "0.92",
    "0.94", "0.96", "0.97", "0.98", "0.99", "1.00", "1.01", "1.02",
    "1.03", "1.04", "1.06", "1.08", "1.10", "1.125", "1.15", "1.175",
    "1.20", "1.25", "1.30",
)

ERAS: tuple[Era, ...] = (
    Era("2019", dt.date(2019, 1, 1), "html", _M_2019, (2, 4, 8),
        "legacy", False, True, False),
    Era("2022-04-29", dt.date(2022, 4, 29), "html", _M_2019, (2, 4, 8),
        "legacy", False, True, False),
    Era("2023-11-16", dt.date(2023, 11, 16), "json", _M_2019, (2, 4, 8),
        "current", True, False, False),
    Era("2024-04-26", dt.date(2024, 4, 26), "json", _M_2024, (2, 4, 8),
        "current", True, False, False),
    Era("2025-08-19", dt.date(2025, 8, 19), "json", _M_2025, (2, 4, 6, 8),
        "current", True, False, True),
)

BAD_PAGE_MARKERS = (
    "No Options found",
    "SEARCH RESULTS",
    "Server too busy. Try it later.",
)
REQUIRED_MARKER = "Implied Volatility is suggested by"


def era_for_date(ingest_date: dt.date) -> Era:
    """The parser era in effect on ``ingest_date`` (latest start <= date)."""
    chosen = ERAS[0]
    for era in ERAS:
        if era.start <= ingest_date:
            chosen = era
    return chosen
