"""Semantics tests for the round-4 scale-path operators, beyond the
oracle parity gate: prefix-join completeness against brute force,
systematic-sample invariants, histogram-quantile error bounds and merge
exactness, per-group HLL accuracy, and salted-join result identity.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from oic_options_chains_spark.operators.sampling import systematic_weighted_sample
from oic_options_chains_spark.operators.setsim import (
    doc_token_sets,
    prefix_similarity_join,
)
from oic_options_chains_spark.operators.sketches import (
    binned_histogram,
    histogram_quantiles,
    hll_group_estimate,
    hll_group_registers,
    hll_merge_registers,
    hll_estimate_from_registers,
    merge_histograms,
)
from oic_options_chains_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon eta"),  # J(1,2) = 5/7
        (3, "alpha beta gamma delta epsilon zeta"),  # duplicate of 1
        (4, "one two three four five six seven eight"),
        (5, "one two three nine ten eleven twelve thirteen"),  # J(4,5)=3/13
        (6, "lorem ipsum dolor sit amet"),
        (7, "lorem ipsum dolor sit alas"),  # J(6,7) = 4/6
        (8, "unrelated totally different words here now"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_prefix_join_matches_brute_force(spark, docs):
    """The prefix filter must be COMPLETE: every pair with Jaccard >= t
    appears, with the exact intersection/union counts."""
    got = {
        (r.doc_a, r.doc_b): (r.inter_n, r.union_n)
        for r in prefix_similarity_join(docs, t_pct=50).collect()
    }
    tok = doc_token_sets(docs).collect()
    sets: dict[int, set] = {}
    for r in tok:
        sets.setdefault(r.doc_id, set()).add(r.term)
    want = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if 100 * inter >= 50 * union:
                want[(a, b)] = (inter, union)
    assert got == want
    assert (1, 3) in got and got[(1, 3)] == (6, 6)  # exact duplicate
    assert (1, 2) in got and (6, 7) in got
    assert (4, 5) not in got  # below threshold


def test_prefix_join_jaccard_e6_integer(spark, docs):
    out = prefix_similarity_join(docs, t_pct=50)
    for r in out.collect():
        assert r.jaccard_e6 == (1_000_000 * r.inter_n) // r.union_n


def test_systematic_sample_invariants(spark):
    rows = [(i, 10 + (i * 37) % 90) for i in range(1, 401)]
    # one giant row whose weight exceeds the step: must ALWAYS be kept
    rows.append((1000, 5000))
    df = spark.createDataFrame(rows, "doc_id LONG, w LONG")
    step = 700
    s = systematic_weighted_sample(df, "doc_id", "w", step)
    picked = s.collect()
    ids = {r.doc_id for r in picked}
    assert 1000 in ids  # weight >= step always selected
    total = sum(w for _, w in rows)
    # every step multiple in (0, total] is covered by exactly one
    # selected row (a heavy row may cover several)
    covered = sum(
        r.cum_weight // step - (r.cum_weight - r.w) // step for r in picked
    )
    assert covered == total // step
    assert len(picked) <= total // step
    # determinism under repartitioning: same membership and cum_weight
    again = {
        (r.doc_id, r.cum_weight)
        for r in systematic_weighted_sample(
            df.repartition(13), "doc_id", "w", step
        ).collect()
    }
    assert again == {(r.doc_id, r.cum_weight) for r in picked}


def test_histogram_quantiles_within_bin_width(spark):
    vals = [(i, (i * 7919) % 4096) for i in range(2000)]
    df = spark.createDataFrame(vals, "id LONG, v LONG")
    bw = 64
    hist = binned_histogram(df, "v", bw)
    out = {r.p: r for r in histogram_quantiles(hist, bw, (50, 90, 99)).collect()}
    ordered = sorted(v for _, v in vals)
    for p in (50, 90, 99):
        # exact p-th percentile: value at rank ceil(p*n/100)
        rank = -(-p * len(ordered) // 100)
        exact = ordered[rank - 1]
        assert out[p].bin_lo <= exact < out[p].bin_hi


def test_histogram_merge_equals_direct(spark):
    vals = [(i, "s%d" % (i % 5), (i * 131) % 1000) for i in range(1500)]
    df = spark.createDataFrame(vals, "id LONG, src STRING, v LONG")
    direct = {
        (r.bin, r.cnt) for r in binned_histogram(df, "v", 32).collect()
    }
    merged = {
        (r.bin, r.cnt)
        for r in merge_histograms(
            binned_histogram(df, "v", 32, group_col="src")
        ).collect()
    }
    assert merged == direct


def test_hll_group_estimate_accuracy_and_merge(spark):
    rows = [(i % 7, "u%d" % (i % (100 * (1 + i % 7)))) for i in range(20000)]
    df = spark.createDataFrame(rows, "grp INT, user STRING")
    regs = hll_group_registers(df, "user", "grp", b=8)
    est = {r.grp: r.estimate for r in hll_group_estimate(regs, b=8).collect()}
    truth = {
        r.grp: r.n
        for r in df.groupBy("grp").agg(F.countDistinct("user").alias("n")).collect()
    }
    for g, t in truth.items():
        assert abs(est[g] - t) <= max(3, int(0.15 * t)), (g, est[g], t)
    # per-group registers MAX-merge into exactly the global sketch
    global_est = hll_estimate_from_registers(
        hll_merge_registers(regs.drop("grp")), b=8
    ).collect()[0]["estimate"]
    from oic_options_chains_spark.operators.sketches import hll_registers

    direct_est = hll_estimate_from_registers(
        hll_registers(df, "user", b=8), b=8
    ).collect()[0]["estimate"]
    assert global_est == direct_est


def test_salted_join_identical_to_plain(spark):
    left = spark.createDataFrame(
        [(i % 10, i, float(i)) for i in range(3000)], "k LONG, rid LONG, v DOUBLE"
    )
    right = spark.createDataFrame(
        [(i, "lbl%d" % i) for i in range(10)], "k LONG, lbl STRING"
    )
    plain = {
        (r.k, r.rid, r.lbl) for r in left.join(right, "k").collect()
    }
    salted = {
        (r.k, r.rid, r.lbl)
        for r in salted_join(left, right, on=["k"], left_salt_from="rid").collect()
    }
    assert salted == plain


def test_mad_outliers_breakdown_resilience(spark):
    """The point of MAD: one absurd value must not move the gate. Inject
    a 1e12 row into a tight group — median/mad unchanged, exactly one
    outlier counted."""
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.robust import mad_outliers

    base = [("a", 100 + (i % 7)) for i in range(99)]
    df = spark.createDataFrame(base + [("a", 10**12)], "g string, x long")
    row = mad_outliers(df, "g", F.col("x"), k_e3=5000).collect()[0]
    clean = mad_outliers(
        spark.createDataFrame(base, "g string, x long"), "g", F.col("x"), k_e3=5000
    ).collect()[0]
    assert row.median == clean.median and row.mad == clean.mad
    assert row.n_rows == 100 and row.n_outliers == clean.n_outliers + 1


def test_mad_zero_flags_any_deviation(spark):
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.robust import mad_outliers

    rows = [("g", 5)] * 10 + [("g", 6)]
    df = spark.createDataFrame(rows, "g string, x long")
    r = mad_outliers(df, "g", F.col("x")).collect()[0]
    assert r.mad == 0 and r.n_outliers == 1
