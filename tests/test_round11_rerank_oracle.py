"""Cross-engine parity for the UNREGISTERED q_ann_pq_rerank (queued for
r12; registry held at 219 this round): the Spark IVF-ADC + exact-rerank
result must hash-match its DuckDB oracle — the full pipeline (coarse
k-means probe, PQ codebooks, ADC shortlist, exact integer-L2 re-rank)
replayed in SQL."""

from __future__ import annotations

import duckdb
import pytest

from oic_options_chains_spark.queries.clustering import (
    ANN_PQ_RERANK_ORACLE,
    q_ann_pq_rerank,
)

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    yield c
    c.close()


def test_ann_pq_rerank_matches_duckdb_oracle(spark, con):
    got = {
        (r.vec_id, r.score, r.rank)
        for r in q_ann_pq_rerank(spark, SF_DIR).collect()
    }
    want = set(map(tuple, con.execute(ANN_PQ_RERANK_ORACLE).fetchall()))
    assert got == want
    assert len(got) == 5
