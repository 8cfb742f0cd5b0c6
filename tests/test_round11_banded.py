"""Banded hyperplane-LSH bipartite near-pairs
(operators/similarity.cross_near_pairs_banded) — the OR-amplified scale
path for semantic decontamination that the single sign-bucket screen's
measured recall collapse motivated (SCALE_CURVE recall_bp:pair_recall).
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.similarity import (
    _hyperplane_keys_kernel,
    cross_near_pairs_banded,
    hyperplane_keys_expr,
)

DIM = 8


def _vecs(spark, rows, name="vec_id"):
    return spark.createDataFrame(rows, f"{name} long, embedding array<float>")


def _rand_vec(rng):
    return [rng.uniform(-1, 1) for _ in range(DIM)]


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


@pytest.mark.parametrize("use_kernel", [False, True])
def test_exact_duplicates_are_never_lost(spark, use_kernel):
    """cos=1 pairs agree on every hyperplane, hence on every table —
    banding can never drop them, at any (L, b)."""
    rng = random.Random(3)
    ref_rows = [(i, _rand_vec(rng)) for i in range(10)]
    probe_rows = [(100 + i, list(v)) for i, v in ref_rows]  # exact copies
    probe_rows += [(200 + i, _rand_vec(rng)) for i in range(20)]
    got = cross_near_pairs_banded(
        _vecs(spark, probe_rows),
        _vecs(spark, ref_rows),
        threshold=0.99,
        n_tables=4,
        bits_per_table=4,
        in_dim=DIM,
        use_kernel=use_kernel,
    ).collect()
    found = {(r.id_a, r.id_b) for r in got}
    assert {(100 + i, i) for i in range(10)} <= found


def test_emit_once_even_on_all_table_agreement(spark):
    """Exact copies agree at EVERY table; the first-matching-table
    predicate must still emit each pair exactly once."""
    rng = random.Random(7)
    ref_rows = [(i, _rand_vec(rng)) for i in range(6)]
    probe_rows = [(100 + i, list(v)) for i, v in ref_rows]
    got = cross_near_pairs_banded(
        _vecs(spark, probe_rows),
        _vecs(spark, ref_rows),
        threshold=0.5,
        n_tables=6,
        bits_per_table=3,
        in_dim=DIM,
    ).collect()
    pairs = [(r.id_a, r.id_b) for r in got]
    assert len(pairs) == len(set(pairs)), "duplicate pair emission"


def test_expression_and_kernel_keys_agree(spark):
    """The Arrow matmul tier must produce bit-identical keys to the
    expression tier for the same vectors and (L, b)."""
    rng = random.Random(11)
    rows = [(i, _rand_vec(rng)) for i in range(40)]
    df = _vecs(spark, rows)
    expr = {
        r.vec_id: r.k
        for r in df.select(
            "vec_id",
            hyperplane_keys_expr(F.col("embedding"), 3, 5, DIM).alias("k"),
        ).collect()
    }
    kern = {
        r["vec_id"]: r["__keys"]
        for r in _hyperplane_keys_kernel(df, "embedding", 3, 5, DIM).collect()
    }
    assert expr == kern


@pytest.mark.parametrize("use_kernel", [False, True])
def test_every_emitted_pair_verifies_and_is_bipartite(spark, use_kernel):
    """Emitted pairs are a SUBSET of the exact threshold relation with
    correct floor(1e6*cos) scores; id_a always from the probe side."""
    rng = random.Random(19)
    probe_rows = [(i, _rand_vec(rng)) for i in range(30)]
    ref_rows = [(1000 + i, _rand_vec(rng)) for i in range(10)]
    got = cross_near_pairs_banded(
        _vecs(spark, probe_rows),
        _vecs(spark, ref_rows),
        threshold=0.2,
        n_tables=8,
        bits_per_table=2,
        in_dim=DIM,
        use_kernel=use_kernel,
    ).collect()
    probe_map = dict((i, v) for i, v in probe_rows)
    ref_map = dict((i, v) for i, v in ref_rows)
    for r in got:
        assert r.id_a in probe_map and r.id_b in ref_map
        c = _cos(probe_map[r.id_a], ref_map[r.id_b])
        assert c >= 0.2
        assert r.score_e6 == math.floor(1e6 * c)


def test_null_vectors_never_pair(spark):
    rng = random.Random(23)
    v = _rand_vec(rng)
    probe_rows = [(1, list(v)), (2, None)]
    ref_rows = [(10, list(v)), (11, None)]
    got = cross_near_pairs_banded(
        _vecs(spark, probe_rows),
        _vecs(spark, ref_rows),
        threshold=0.9,
        n_tables=2,
        bits_per_table=2,
        in_dim=DIM,
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 10)}


def test_single_table_degenerates_to_one_bucket_join(spark):
    """n_tables=1 (no earlier-table predicate) still works and still
    verifies exactly."""
    rng = random.Random(29)
    ref_rows = [(i, _rand_vec(rng)) for i in range(5)]
    probe_rows = [(100 + i, list(v)) for i, v in ref_rows]
    got = cross_near_pairs_banded(
        _vecs(spark, probe_rows),
        _vecs(spark, ref_rows),
        threshold=0.99,
        n_tables=1,
        bits_per_table=2,
        in_dim=DIM,
    ).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(100 + i, i) for i in range(5)}
