"""ivf_pq_topk_batch — the one-fit many-queries serving shape. Property:
each qid's rows match the single-query ivf_pq_topk(query_id=qid)
bit-for-bit (same fit parameters, same integer arithmetic), with and
without the rerank stage; per-qid output is exactly topk dense ranks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F  # noqa: F401

from oic_options_chains_spark.operators.pq import ivf_pq_topk, ivf_pq_topk_batch
from oic_options_chains_spark.sources.registry import load_table

QIDS = (0, 17, 101)
KW = dict(coarse_k=8, n_probe=2, n_sub=8, k_sub=16, iters=2, topk=5)


@pytest.mark.parametrize("rerank", [None, 50])
def test_batch_matches_single_query_per_qid(spark, sf_dir, rerank):
    e = load_table(spark, sf_dir, "embeddings")
    batch = {
        (r.qid, r.rank): (r.vec_id, r.score)
        for r in ivf_pq_topk_batch(e, QIDS, rerank=rerank, **KW).collect()
    }
    for qid in QIDS:
        single = ivf_pq_topk(e, query_id=qid, rerank=rerank, **KW).collect()
        assert len(single) == 5
        for r in single:
            assert batch[(qid, r.rank)] == (r.vec_id, r.score), (qid, r.rank)


def test_absent_query_id_contributes_no_rows(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = ivf_pq_topk_batch(e, (0, 10_000_000), **KW).collect()
    assert {r.qid for r in out} == {0}
    assert len(out) == 5


def test_batch_ranks_dense_per_qid(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    out = ivf_pq_topk_batch(e, QIDS, **KW).collect()
    assert len(out) == len(QIDS) * 5
    for qid in QIDS:
        ranks = sorted(r.rank for r in out if r.qid == qid)
        assert ranks == [1, 2, 3, 4, 5]
        assert all(r.vec_id != qid for r in out if r.qid == qid)
