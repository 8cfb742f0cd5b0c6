"""The attestation-window rotation in __spark_entry__.py.

The driver hash-checks only the first 50 ``queries()`` entries per
round, so the rotation IS the correctness-attestation scheduler: a bug
here silently starves keys of driver rows (or worse, lets a red row age
out unfixably). These tests pin the ordering contract:

1. latest-red keys come first — a red row always re-enters the next
   window, because a red that never re-records can never turn green;
2. then by staleness, OLDEST-attested first; never-attested keys rank
   as if attested at maxr-3 (a key with NO external check ever is the
   bigger evidence gap than a green row aging a few rounds, so new keys
   tie with the oldest realistic cohort and win the tie on row count 0,
   while truly ancient rows still refresh first);
3. then least-recorded (coverage grows monotonically);
4. among equals, keys absent from the most recent round precede keys it
   covered (consecutive rounds alternate the tail);
5. registration order is the final, stable tie-break.

No Spark session needed — this is pure ordering logic over synthetic
CORRECTNESS_r*.json files.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod


def _write_round(tmp_path, n, rows):
    (tmp_path / f"CORRECTNESS_r{n:02d}.json").write_text(json.dumps(rows))


def _green():
    return {"rows_match": True, "schema_match": True, "hash_match": True}


def _red():
    return {"rows_match": True, "schema_match": True, "hash_match": False}


def _rows_only():
    # no-oracle contract: driver records no hash verdict
    return {"rows_match": True, "schema_match": True, "hash_match": None}


def test_no_history_preserves_registration_order(tmp_path):
    mapping = {f"q{i}": i for i in range(6)}
    assert list(entry_mod._rotated(mapping, str(tmp_path))) == list(mapping)


def test_latest_red_keys_front_load(tmp_path):
    mapping = {f"q{i}": i for i in range(6)}
    _write_round(tmp_path, 1, {"q0": _green(), "q1": _red(), "q2": _green()})
    order = list(entry_mod._rotated(mapping, str(tmp_path)))
    # red q1 first, then the never-recorded tail, then once-recorded greens
    assert order[0] == "q1"
    assert order[1:4] == ["q3", "q4", "q5"]
    assert set(order[4:]) == {"q0", "q2"}


def test_red_fixed_in_later_round_loses_priority(tmp_path):
    mapping = {f"q{i}": i for i in range(4)}
    _write_round(tmp_path, 1, {"q0": _red(), "q1": _green()})
    _write_round(tmp_path, 2, {"q0": _green(), "q2": _green()})
    order = list(entry_mod._rotated(mapping, str(tmp_path)))
    # q0's LATEST row is green -> no longer front-loaded; q3 never recorded
    assert order[0] == "q3"
    assert order.index("q1") < order.index("q0"), "q1 absent from latest round"


def test_red_in_latest_round_beats_never_recorded(tmp_path):
    # the exact round-3 failure mode: a latest-red key that the old
    # (times_recorded, in_latest, ...) sort pushed OUT of the next window
    mapping = {f"q{i}": i for i in range(60)}
    latest = {f"q{i}": _green() for i in range(50)}
    latest["q7"] = _red()
    _write_round(tmp_path, 3, latest)
    order = list(entry_mod._rotated(mapping, str(tmp_path)))
    assert order[0] == "q7"
    assert order.index("q7") < order.index("q50"), "red precedes unrecorded"


def test_rows_only_checks_are_not_red(tmp_path):
    mapping = {"qa": 0, "qb": 1, "qc": 2}
    _write_round(tmp_path, 1, {"qa": _rows_only(), "qb": _green()})
    order = list(entry_mod._rotated(mapping, str(tmp_path)))
    # a null hash verdict (no-oracle contract) must not front-load
    assert order[0] == "qc"


def test_repo_window_admits_reds_and_ranks_never_attested():
    """Against the REAL repo history: every latest-red key must land
    inside the next 50-entry window, and a never-attested key may only
    wait outside if every window slot is held by a red or a STALER key
    (virtual round < the never-attested rank maxr-3) — i.e. new
    registrations queue behind genuinely aging driver rows, never
    behind fresh ones."""
    from oic_options_chains_spark.queries import QUERIES

    seen, last_round, _latest, latest_red = entry_mod._recorded_rounds()
    order = list(entry_mod._rotated(dict(QUERIES)))
    window = order[:50]
    for key in latest_red:
        assert key in window, f"latest-red {key} outside the window"
    maxr = max(last_round.values(), default=0)
    never_rank = max(maxr - 3, 0)
    never_outside = [
        k for k in QUERIES if k not in seen and k not in window
    ]
    if never_outside:
        for w in window:
            assert (
                w in latest_red or last_round.get(w, never_rank) <= never_rank
            ), f"{w} holds a slot while never-attested keys wait"


def test_oldest_attested_precedes_recently_attested(tmp_path):
    # q0 green in r1 only (stale), q1 green in r1 AND r3 (fresh); the
    # stale key must re-enter the window before the fresh one even
    # though both are green and q1 has MORE recorded rows.
    mapping = {"q0": 0, "q1": 1, "q2": 2}
    _write_round(tmp_path, 1, {"q0": _green(), "q1": _green()})
    _write_round(tmp_path, 3, {"q1": _green(), "q2": _green()})
    order = list(entry_mod._rotated(mapping, str(tmp_path)))
    assert order[0] == "q0", "stale-attested key must lead the window"
    # among the r3-fresh pair, least-recorded (q2) precedes q1
    assert order[1:] == ["q2", "q1"]


def test_repo_window_refreshes_stalest_cohort():
    """Against the REAL repo history: the next window must be filled with
    the 50 stalest keys by VIRTUAL round (never-attested rank as
    maxr-3): no key may hold a slot while a staler one waits outside."""
    from oic_options_chains_spark.queries import QUERIES

    _seen, last_round, _latest, latest_red = entry_mod._recorded_rounds()
    order = list(entry_mod._rotated(dict(QUERIES)))
    window, outside = order[:50], order[50:]
    if not outside:
        return
    maxr = max(last_round.values(), default=0)
    vr = lambda k: last_round.get(k, max(maxr - 3, 0))  # noqa: E731
    oldest_outside = min(vr(k) for k in outside)
    for key in window:
        if key in latest_red:
            continue
        assert vr(key) <= oldest_outside, (
            f"{key} (vr{vr(key)}) holds a window slot while a staler key "
            f"(vr{oldest_outside}) waits outside"
        )
