"""Cross-engine parity for the UNREGISTERED q_decontam_banded (queued
for r12 registration; registry held at 219 this round): the Spark
banded-LSH decontamination result must hash-match its DuckDB oracle the
same way the driver's t2 gate compares registered queries — proving the
md5-parity hyperplane construction is engine-portable BEFORE it enters
the contract."""

from __future__ import annotations

import duckdb
import pytest

from oic_options_chains_spark.queries.profiling import (
    DECONTAM_BANDED_ORACLE,
    q_decontam_banded,
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


def test_decontam_banded_matches_duckdb_oracle(spark, con):
    got = {
        (r.vec_id, r.contaminant_id, r.score_e6)
        for r in q_decontam_banded(spark, SF_DIR).collect()
    }
    want = set(map(tuple, con.execute(DECONTAM_BANDED_ORACLE).fetchall()))
    assert got == want
    assert got, "banded decontamination found no pairs on the test corpus"
