"""LSH banding S-curve: the exact-integer expression must equal the
analytic 1 - (1 - s^r)^b, and expected recall must weight by the
observed pair histogram."""

from __future__ import annotations

from fractions import Fraction

from oic_options_chains_spark.operators.minhash import (
    LSH_CONFIGS,
    lsh_recall_audit,
)


def test_p_matches_analytic_and_recall_weights(spark):
    # pairs at 52%, 52%, 91%, 100% similarity
    pairs = spark.createDataFrame(
        [(5200,), (5299,), (9100,), (10000,)], "jaccard_bp bigint"
    )
    rows = lsh_recall_audit(pairs).collect()
    assert {(r["rows_per_band"], r["bands"]) for r in rows} == set(LSH_CONFIGS)
    by_cfg = {}
    for r in rows:
        key = (r["rows_per_band"], r["bands"])
        by_cfg.setdefault(key, {})[r["s_tenths"]] = r
        # exact analytic check
        s = Fraction(r["s_tenths"], 10)
        p = 1 - (1 - s ** r["rows_per_band"]) ** r["bands"]
        assert r["p_e6"] == (1_000_000 * p.numerator) // p.denominator
    for (rr, bb), buckets in by_cfg.items():
        assert set(buckets) == {5, 9, 10}
        assert buckets[5]["n_pairs"] == 2
        assert buckets[10]["p_e6"] == 1_000_000  # exact dup always collides
        num = sum(b["n_pairs"] * b["p_e6"] for b in buckets.values())
        den = sum(b["n_pairs"] for b in buckets.values())
        assert all(
            b["config_recall_e6"] == num // den for b in buckets.values()
        )
    # more bands at fixed budget => higher recall everywhere
    assert (
        by_cfg[(1, 16)][5]["config_recall_e6"]
        > by_cfg[(16, 1)][5]["config_recall_e6"]
    )
