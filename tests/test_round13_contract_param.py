"""Round 13 (VERDICT r12 item 5): the recall contract becomes the
DEFAULT path — cross_near_pairs_banded with n_tables=None SOLVES its
table count from (contract_cos, target+margin) via tables_for instead
of inheriting a hardcoded 28. Pins:

- the solver's margin anchors: the default contract (0.7, 9000+400)
  resolves to exactly the round-12 shipped L=28 (so every existing
  caller, oracle and recorded curve is bit-identical), and the new
  0.8 contract resolves to 17;
- default-call == explicit-n_tables=28 result equality on real data
  (the no-behavior-change guarantee, checked on outputs not plumbing);
- q_decontam_t08 serves the solver's L=17 parameterization: equal to
  an explicitly constructed n_tables=17 screen, and NOT equal in
  plan-cost shape to the 28-table form (17 posexplode rows per vector);
- planted-pair recall AT the 0.8 boundary with the resolved L=17 —
  the deterministic sf0.001 twin of the SCALE_CURVE planted_c80 row
  (theory at the boundary: 1-(1-p^8)^17 = 9482 bp; the md5-seeded
  planted directions are deterministic, so the observed value is a
  fixed property of the corpus, not a flake source).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from oic_options_chains_spark.operators.similarity import (
    cross_near_pairs_banded,
    tables_for,
)
from oic_options_chains_spark.sources.registry import load_table


def test_margin_solver_anchors():
    # the r13 closed-form anchors (target 9000 + the then-400 bp flat
    # margin). Since round 14 the DEFAULT path solves the dispersed
    # curve at 9000+250 instead (test_round14_dispersion pins that it
    # resolves to the same 28/17/45) — these stay as the closed-form
    # regression anchors.
    assert tables_for(0.7, 9400) == 28
    assert tables_for(0.8, 9400) == 17
    assert tables_for(0.6, 9400) == 45


def _pairs(df):
    return {(r.id_a, r.id_b, r.score_e6) for r in df.collect()}


def test_default_path_equals_shipped_28_tables(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 10 == 0)
    tr = emb.filter(F.col("vec_id") % 10 != 0)
    got = _pairs(cross_near_pairs_banded(tr, ev, threshold=0.35))
    want = _pairs(cross_near_pairs_banded(tr, ev, threshold=0.35, n_tables=28))
    assert got == want and got  # non-empty on the test corpus


def test_t08_key_serves_the_solved_17_tables(spark, sf_dir):
    from oic_options_chains_spark.queries import QUERIES

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 10 == 0)
    tr = emb.filter(F.col("vec_id") % 10 != 0)
    explicit = cross_near_pairs_banded(tr, ev, threshold=0.5, n_tables=17)
    from pyspark.sql.window import Window

    w = Window.partitionBy("id_a").orderBy(
        F.col("score_e6").desc(), F.col("id_b").asc()
    )
    want = {
        (r.vec_id, r.contaminant_id, r.score_e6)
        for r in explicit.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("id_a").alias("vec_id"),
            F.col("id_b").alias("contaminant_id"),
            "score_e6",
        )
        .collect()
    }
    got = {
        (r.vec_id, r.contaminant_id, r.score_e6)
        for r in QUERIES["q_decontam_t08"](spark, sf_dir).collect()
    }
    assert got == want


def _rand_dir(seed: int, dim: int) -> np.ndarray:
    vals: list[float] = []
    ctr = 0
    while len(vals) < dim:
        h = hashlib.md5(f"plant13:{seed}:{ctr}".encode()).digest()
        for b in range(0, 16, 4):
            vals.append(int.from_bytes(h[b : b + 4], "big") / 2**32 - 0.5)
        ctr += 1
    return np.array(vals[:dim])


def test_planted_recall_at_the_08_boundary(spark, sf_dir):
    """Plant 4 deterministic twins at cos=0.8 per eval vector and screen
    with the 0.8-contract default path (resolved L=17). Theory at the
    boundary is 9482 bp over infinitely many pairs; this fixed corpus's
    200 planted pairs measure >= 9000 bp (the contract floor) — the
    sf0.1-2 measurement lives in SCALE_CURVE recall_bp:planted_c80."""
    target_cos = 0.8
    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 10 == 0)
    ev_rows = ev.orderBy("vec_id").limit(256).collect()
    assert ev_rows

    base = 1_000_000_000
    rows = []
    for r in ev_rows:
        e = np.array(r.embedding, dtype=np.float64)
        e = e / np.linalg.norm(e)
        for j in range(4):
            u = _rand_dir(r.vec_id * 4 + j, len(e))
            u = u - np.dot(u, e) * e
            u = u / np.linalg.norm(u)
            t = target_cos * e + math.sqrt(1 - target_cos**2) * u
            rows.append(
                (base + int(r.vec_id) * 4 + j, [float(x) for x in t])
            )
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    twins = spark.createDataFrame(rows, schema)
    hits = (
        cross_near_pairs_banded(
            twins,
            ev.orderBy("vec_id").limit(256),
            threshold=target_cos - 0.02,
            contract_cos=target_cos,
        )
        .filter(F.col("id_b") == F.floor((F.col("id_a") - F.lit(base)) / 4))
        .count()
    )
    recall_bp = 10_000 * hits // len(rows)
    assert recall_bp >= 9000, f"planted 0.8-boundary recall {recall_bp} bp"
