"""Date helpers.

``prior_year_date`` re-expresses the reference's year-inference for
"dd-MMM" strings scraped without a year (reference:
transform-load.2025-08-19.rkt:228-240; legacy transform-load.rkt:133-142):
pick the current-year date if it does not land after the snapshot date,
else the prior-year date; "29-Feb" is first rewritten to "28-Feb" (the
reference's leap-year hack, :230-233).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def prior_year_date(
    day_month: Column, snapshot_date: Column, leap_hack: bool = True
) -> Column:
    """Resolve a ``dd-MMM`` string to a date at-or-before ``snapshot_date``.

    Both arguments are Columns; ``snapshot_date`` must be DateType.
    Returns DateType (SURVEY.md F18). ``leap_hack=False`` reproduces the
    pre-2023 eras, which lacked the 29-Feb rewrite (transform-load.rkt:133)
    — there an off-year 29-Feb parses to NULL instead.
    """
    dm = (
        F.regexp_replace(day_month, "^29-Feb$", "28-Feb")
        if leap_hack
        else day_month
    )
    this_year = F.to_date(
        F.concat(dm, F.lit("-"), F.year(snapshot_date).cast("string")),
        "dd-MMM-yyyy",
    )
    last_year = F.to_date(
        F.concat(dm, F.lit("-"), (F.year(snapshot_date) - 1).cast("string")),
        "dd-MMM-yyyy",
    )
    return F.when(this_year <= snapshot_date, this_year).otherwise(last_year)
