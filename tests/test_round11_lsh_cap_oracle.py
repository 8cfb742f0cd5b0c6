"""Cross-engine parity for the UNREGISTERED q_lsh_pairs_capped (queued
for r12): the two-tier capped pair join must equal the oracle's closed
form — a pair qualifies iff it shares a bucket at-or-under the cap OR
shares >= 2 buckets — and the cap must actually engage on the test
corpus (some bucket over the cap), or the key would be vacuous."""

from __future__ import annotations

import duckdb
import pytest

from oic_options_chains_spark.queries.extensions import (
    LSH_PAIRS_CAPPED_ORACLE,
    _LSH_CAP,
    q_lsh_pairs_capped,
    q_minhash_lsh_pairs,
)

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    yield c
    c.close()


def test_lsh_pairs_capped_matches_duckdb_oracle(spark, con):
    got = {
        (r.doc_a, r.doc_b) for r in q_lsh_pairs_capped(spark, SF_DIR).collect()
    }
    want = set(map(tuple, con.execute(LSH_PAIRS_CAPPED_ORACLE).fetchall()))
    assert got == want


def test_cap_engages_on_the_test_corpus(spark, con):
    """At the pinned cap some bucket must exceed it, so the hot tier is
    actually exercised by the contract corpus (not a vacuous key); and
    the capped pair set is a subset of the uncapped one."""
    from oic_options_chains_spark.queries.extensions import _SIG_SQL

    max_bucket = con.execute(
        _SIG_SQL
        + """,
        bands AS (
          SELECT doc_id, CAST(seed // 4 AS INT) AS band,
                 string_agg(minhash, ',' ORDER BY seed) AS band_key
          FROM sig GROUP BY doc_id, seed // 4)
        SELECT MAX(n) FROM (
          SELECT COUNT(*) AS n FROM bands GROUP BY band, band_key)
        """
    ).fetchone()[0]
    assert max_bucket > _LSH_CAP, "no bucket over the cap: hot tier idle"
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in q_minhash_lsh_pairs(spark, SF_DIR).collect()
    }
    capped = {
        (r.doc_a, r.doc_b) for r in q_lsh_pairs_capped(spark, SF_DIR).collect()
    }
    assert capped <= uncapped
