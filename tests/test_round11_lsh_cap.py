"""Round-11 hot-bucket guard for the MinHash pair-contract path
(VERDICT r10 item 5): ``lsh_candidate_pairs(hot_bucket_cap=...)``.

The cluster consumers were already safe via ``lsh_star_edges``; this
covers the queries whose CONTRACT is the pair list. Inside a bucket past
the cap, a pair must also agree on a second band — the same two-tier
shape as the aHash fix (phash.pairs_from_band_table), with the
probabilistic (not pigeonhole) semantics the docstring spells out.
"""

import pytest
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.minhash import (
    doc_shingles,
    lsh_candidate_pairs,
    minhash_band_keys,
)
from oic_options_chains_spark.sources.registry import load_table


def _bands(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, band int, band_key string")


class TestHotBucketCap:
    def test_template_bucket_pruned_true_dups_kept(self, spark):
        """One biased band-0 bucket holds every doc (the template-corpus
        shape); only docs 1+2 also agree on band 1. Uncapped emits the
        full clique; capped keeps exactly the second-band pair."""
        rows = []
        for d in range(10):
            rows.append((d, 0, "TEMPLATE"))  # biased band: everyone
            rows.append((d, 1, "dup" if d in (1, 2) else f"u{d}"))
        bands = _bands(spark, rows)
        uncapped = {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(bands, "doc_id").collect()
        }
        capped = {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(bands, "doc_id", hot_bucket_cap=4).collect()
        }
        assert len(uncapped) == 45  # 10 choose 2: the quadratic clique
        assert capped == {(1, 2)}

    def test_capped_is_subset_and_keeps_normal_buckets(self, spark):
        """Buckets at or under the cap are untouched: their pairs match
        the uncapped form exactly; hot-bucket pairs only shrink."""
        rows = []
        for d in range(8):
            rows.append((d, 0, "HOT"))  # 8 members: hot at cap=4
        rows += [(0, 1, "x"), (1, 1, "x"), (5, 1, "y"), (6, 1, "y")]
        for d in (2, 3, 4, 7):
            rows.append((d, 1, f"solo{d}"))
        bands = _bands(spark, rows)
        uncapped = {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(bands, "doc_id").collect()
        }
        capped = {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(bands, "doc_id", hot_bucket_cap=4).collect()
        }
        assert capped <= uncapped
        # the band-1 buckets are size 2 (normal tier): both pairs kept
        assert {(0, 1), (5, 6)} <= capped
        # and they are the only survivors: every other pair existed only
        # through the hot band-0 bucket with no second-band agreement
        assert capped == {(0, 1), (5, 6)}

    def test_exact_duplicates_always_survive(self, spark):
        """Docs agreeing on EVERY band (exact dups) can never be lost:
        inside any hot bucket they agree on all other bands too."""
        rows = []
        for d in range(12):
            rows.append((d, 0, "HOT"))
            rows.append((d, 1, "B1" if d < 3 else f"b{d}"))
            rows.append((d, 2, "B2" if d < 3 else f"c{d}"))
        bands = _bands(spark, rows)
        capped = {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(bands, "doc_id", hot_bucket_cap=5).collect()
        }
        assert {(0, 1), (0, 2), (1, 2)} <= capped

    def test_single_band_table_rejected(self, spark):
        bands = _bands(spark, [(0, 0, "a"), (1, 0, "a")])
        with pytest.raises(ValueError, match="2 bands"):
            lsh_candidate_pairs(bands, "doc_id", hot_bucket_cap=4)

    def test_cap_never_engaged_equals_uncapped(self, spark, sf_dir):
        """On the real fixture corpus with a cap no bucket reaches, the
        capped plan returns the identical pair set — the contract the
        oracle-checked q_minhash_lsh_pairs relies on when the cap is
        deployed with honest headroom."""
        d = load_table(spark, sf_dir, "documents")
        bands = minhash_band_keys(
            doc_shingles(d, "doc_id", "text", distinct=False), "doc_id"
        )
        base = {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(bands, "doc_id").collect()
        }
        capped = {
            (r.doc_a, r.doc_b)
            for r in lsh_candidate_pairs(
                bands, "doc_id", hot_bucket_cap=100_000
            ).collect()
        }
        assert base == capped
