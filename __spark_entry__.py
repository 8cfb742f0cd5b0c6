"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``oic_options_chains_spark``; see SURVEY.md
section 2 for the operator inventory each query key represents.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The composite chain-build pipeline: as-of price -> decimal targets ->
    nearest expiry/strike selection -> side explode -> PK dedup
    (SURVEY.md section 3.2).
    """
    from oic_options_chains_spark.pipelines.chains import build_chain

    return build_chain(spark, "/root/testdata/sf0.001")


def _recorded_rounds(
    here: str | None = None,
) -> tuple[dict[str, int], dict[str, int], set[str], set[str]]:
    """Per-query driver attestation state from CORRECTNESS_r*.json:
    (rounds-recorded count, LAST round recorded, most recent round's key
    set, keys whose LATEST recorded row is red — any explicit False among
    rows_match / schema_match / hash_match).

    The driver records the first 50 ``queries()`` entries per round, and
    the registry holds more than 50 — so the dicts below are ordered
    oldest-attested-first (stable by registration order within a tier).
    Every query then rotates into the driver's 50-row window across
    rounds and keeps a FRESH hash-checked row; without the rotation a key
    attested once in an early round would stay green-but-stale forever
    while the code under it churns.
    """
    import glob
    import json
    import re

    if here is None:
        here = os.path.dirname(os.path.abspath(__file__))
    seen: dict[str, int] = {}
    last_round: dict[str, int] = {}
    latest: set[str] = set()
    latest_red: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as fh:
                rows = json.load(fh)
        except (OSError, ValueError):
            continue
        match = re.search(r"r(\d+)", os.path.basename(path))
        rnd = int(match.group(1)) if match else 0
        if isinstance(rows, dict):
            latest = set(rows)
            for key, row in rows.items():
                seen[key] = seen.get(key, 0) + 1
                last_round[key] = max(last_round.get(key, 0), rnd)
                checks = (
                    (row.get("rows_match"), row.get("schema_match"), row.get("hash_match"))
                    if isinstance(row, dict)
                    else ()
                )
                if any(c is False for c in checks):
                    latest_red.add(key)
                else:
                    latest_red.discard(key)
    return seen, last_round, latest, latest_red


def _rotated(mapping: dict, here: str | None = None) -> dict:
    seen, last_round, latest, latest_red = _recorded_rounds(here)
    order = list(mapping)
    # latest-red keys FIRST (a red row that never re-enters the window
    # can never turn green), then by staleness: OLDEST-attested first (a
    # key last hash-checked in round 2 is staler than one checked last
    # round, regardless of how many total rows it has). Never-attested
    # keys enter AS IF last attested three rounds ago (max(maxr-3, 0)):
    # a key with NO external check ever is the bigger evidence gap than
    # a green driver row aging a few rounds of code churn (both pass the
    # three local parity gates against current code), so never-attested
    # keys tie with the oldest realistic cohort and win the tie on
    # recorded-row count 0 — without starving truly ancient rows, which
    # still rank ahead. Final ties: least-recorded, keys the most recent
    # round did NOT cover, registration order.
    maxr = max(last_round.values(), default=0)
    never_rank = max(maxr - 3, 0)
    key = lambda k: (  # noqa: E731
        k not in latest_red,
        last_round.get(k, never_rank),
        seen.get(k, 0),
        k in latest,
        order.index(k),
    )
    return {k: mapping[k] for k in sorted(order, key=key)}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2,
    least-driver-recorded first (see _recorded_rounds)."""
    from oic_options_chains_spark.queries import QUERIES

    return _rotated(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted keys get the weaker
    rows-only check). Same rotation order as ``queries()``."""
    from oic_options_chains_spark.queries import ORACLE

    return _rotated(dict(ORACLE))
