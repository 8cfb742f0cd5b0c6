"""Dialect matrix for the JDBC sink (VERDICT r9 item 5): the generated
statements, stage DDL pins, and retry sets for BOTH the in-sandbox
engine (Derby) and the reference's real target (Postgres —
transform-load.2025-08-19.rkt:175-209 issues
``INSERT ... ON CONFLICT (pk...) DO NOTHING``) are golden-tested as
pure strings, no live server needed. The Derby branch additionally has
live e2e coverage in test_jdbc_live.py."""

from __future__ import annotations

import pytest

from oic_options_chains_spark.sources.jdbc import (
    DIALECTS,
    RETRYABLE_SQL_STATES,
    conflict_ignore_sql,
    get_dialect,
    stage_varchar_pins,
)

COLS = ["act_symbol", "expiration", "strike", "bid"]
PK = ["act_symbol", "expiration", "strike"]


def test_postgres_statement_is_the_reference_conflict_clause():
    sql = conflict_ignore_sql("oic.option_chain", "stage_ab12", COLS, PK, "postgresql")
    assert sql == (
        "INSERT INTO oic.option_chain (act_symbol, expiration, strike, bid) "
        'SELECT s."act_symbol", s."expiration", s."strike", s."bid" '
        "FROM stage_ab12 s "
        "ON CONFLICT (act_symbol, expiration, strike) DO NOTHING"
    )


def test_derby_statement_is_the_not_exists_form():
    sql = conflict_ignore_sql("option_chain", "stage_ab12", COLS, PK, "derby")
    assert sql == (
        "INSERT INTO option_chain (act_symbol, expiration, strike, bid) "
        'SELECT s."act_symbol", s."expiration", s."strike", s."bid" '
        "FROM stage_ab12 s "
        "WHERE NOT EXISTS (SELECT 1 FROM option_chain t "
        'WHERE t.act_symbol = s."act_symbol" AND t.expiration = '
        's."expiration" AND t.strike = s."strike")'
    )


def test_unknown_dialect_gets_the_conservative_ansi_profile():
    d = get_dialect("oracle")
    assert not d.native_conflict_clause and d.varchar_max == 32_672
    sql = conflict_ignore_sql("t", "s1", ["a"], ["a"], "oracle")
    assert "NOT EXISTS" in sql and "ON CONFLICT" not in sql


@pytest.mark.parametrize("dialect", sorted(DIALECTS))
def test_stage_pins_floor_at_4000_and_keep_schema_order(dialect):
    pins = stage_varchar_pins({"sym": 12, "note": 5000}, ["sym"], dialect)
    assert pins == "sym VARCHAR(4000), note VARCHAR(5000)"


def test_derby_over_cap_nonpk_column_falls_back_to_lob():
    # 40k chars exceeds Derby's 32672 VARCHAR cap -> left off the pin
    # list (lands as CLOB), while the same width pins fine on Postgres
    widths = {"sym": 12, "body": 40_000}
    assert stage_varchar_pins(widths, ["sym"], "derby") == "sym VARCHAR(4000)"
    assert stage_varchar_pins(widths, ["sym"], "postgresql") == (
        "sym VARCHAR(4000), body VARCHAR(40000)"
    )


def test_over_cap_pk_raises_on_derby_but_not_postgres():
    widths = {"sym": 40_000}
    with pytest.raises(ValueError, match="VARCHAR cap"):
        stage_varchar_pins(widths, ["sym"], "derby")
    assert stage_varchar_pins(widths, ["sym"], "postgresql") == "sym VARCHAR(40000)"


def test_retry_sets_match_each_engines_failure_modes():
    # Derby (NOT EXISTS form): the loser of the probe race hits the PK
    # constraint or the winner's insert locks. Postgres (ON CONFLICT):
    # dup keys never error, only deadlock/serialization do.
    assert DIALECTS["derby"].retryable_states == {"23505", "40001", "40XL1"}
    assert DIALECTS["postgresql"].retryable_states == {"40001", "40P01"}
    assert "23505" not in DIALECTS["postgresql"].retryable_states
    # the message-scan fallback covers the union
    assert RETRYABLE_SQL_STATES == {"23505", "40001", "40XL1", "40P01"}
