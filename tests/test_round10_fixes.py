"""Round-10 fixes: full-lineage plan audit past localCheckpoint
barriers (VERDICT r9 finding 1), null-tolerant jl_project width gate,
SQLState-chain retry predicate for the JDBC conflict-ignore race, and a
non-local-path fallback for table_row_count (ADVICE r9)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F


# --- full-lineage plan gates: the checkpointed prefixes stay clean ----------
#
# localCheckpoint truncates lineage, so the final executedPlan of these
# queries hides everything before the barrier — exactly where the r9
# fused-filter trap lived. capture_checkpoints() records each
# pre-truncation DataFrame; the gates below re-apply the registry-wide
# invariants (no fused pipeline filters, no row-at-a-time Python, no
# cartesians) over every captured stage. tools/plan_audit.py records the
# same facts for all 219 queries; this pins the previously-blind ones in
# the suite.

_BLIND_QUERIES = (
    "q_ahash_dedup",  # r9 audit reported scans: 0 for this one
    "q_media_pipeline",  # the mapInPandas kernel tier
    "q_dedup_clusters",  # iterative star-contraction rounds
    "q_bpe_train",  # iterative merge loop
)


@pytest.fixture(scope="module")
def captured_stages(spark, sf_dir):
    from oic_options_chains_spark.lineage import capture_checkpoints
    from oic_options_chains_spark.queries import QUERIES

    out = {}
    for name in _BLIND_QUERIES:
        with capture_checkpoints() as stages:
            QUERIES[name](spark, sf_dir)
        out[name] = [
            (s.site, s.df._jdf.queryExecution().executedPlan().toString(),
             s.df._jdf.queryExecution().optimizedPlan().toString())
            for s in stages
        ]
    return out


def test_checkpoint_capture_sees_the_hidden_prefixes(captured_stages):
    # the gate must not silently go blind again: each of these queries
    # really does checkpoint, and the captured prefix really does scan
    for name, stages in captured_stages.items():
        assert stages, f"{name} captured no checkpoint stages"
    prefix_plans = "".join(p for _, p, _ in captured_stages["q_ahash_dedup"])
    assert "Scan parquet" in prefix_plans


def test_checkpoint_prefixes_have_no_fused_pipeline_filters(captured_stages):
    for name, stages in captured_stages.items():
        for site, _plan, opt in stages:
            fused = [
                len(line)
                for line in opt.splitlines()
                if re.match(r"\s*[+:]*-? *Filter ", line) and len(line) > 4000
            ]
            assert not fused, (name, site, fused)


def test_checkpoint_prefixes_stay_jvm_side(captured_stages):
    # pandas kernels (MapInPandas) are the contracted Python tier and
    # allowed; row-at-a-time BatchEvalPython and cartesians are not
    for name, stages in captured_stages.items():
        for site, plan, _opt in stages:
            assert "BatchEvalPython" not in plan, (name, site)
            assert "CartesianProduct" not in plan, (name, site)


def test_capture_restores_the_method_on_error(spark):
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    from oic_options_chains_spark.lineage import capture_checkpoints

    before = ClassicDF.__dict__["localCheckpoint"]
    with pytest.raises(RuntimeError):
        with capture_checkpoints():
            raise RuntimeError("boom")
    assert ClassicDF.__dict__["localCheckpoint"] is before


# --- jl_project: NULL vectors propagate, wrong widths still raise -----------


def test_jl_project_null_vector_propagates_null(spark):
    """ADVICE r9 (projection.py): size(NULL) is -1/NULL, so the width
    gate used to fall into raise_error with a misleading message; a
    null embedding must yield null proj like the in_dim=None branch."""
    from oic_options_chains_spark.operators.projection import jl_project

    df = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3, 0.4]), (2, None)],
        "vec_id int, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in jl_project(df, out_dim=2, in_dim=4).collect()}
    assert rows[1]["proj"] is not None
    assert rows[2]["proj"] is None and rows[2]["norm_ratio_bp"] is None


# --- JDBC retry predicate: SQLState chain walk ------------------------------


class _FakeThrowable:
    """Duck-typed stand-in for a py4j-wrapped java.sql.SQLException."""

    def __init__(self, state=None, nxt=None, cause=None, sqlexc=True):
        self._state = state
        self._next = nxt
        self._cause = cause
        self._sqlexc = sqlexc

    def getSQLState(self):
        if not self._sqlexc:
            raise AttributeError("not a SQLException")
        return self._state

    def getNextException(self):
        if not self._sqlexc:
            raise AttributeError("not a SQLException")
        return self._next

    def getCause(self):
        return self._cause


class _FakePy4JError(Exception):
    def __init__(self, java_exception):
        super().__init__("py4j wrapped")
        self.java_exception = java_exception


@pytest.mark.parametrize("state", ["23505", "40001", "40XL1"])
def test_retryable_states_found_via_chain_walk(state):
    from oic_options_chains_spark.sources.jdbc import (
        RETRYABLE_SQL_STATES,
        _sql_states,
    )

    # state sits one level down a wrapper Throwable, reachable via cause
    inner = _FakeThrowable(state=state)
    outer = _FakeThrowable(sqlexc=False, cause=inner)
    exc = _FakePy4JError(outer)
    assert _sql_states(exc) & RETRYABLE_SQL_STATES == {state}


def test_next_exception_link_is_walked():
    from oic_options_chains_spark.sources.jdbc import _sql_states

    chain = _FakeThrowable(state="XJ001", nxt=_FakeThrowable(state="40XL1"))
    assert _sql_states(_FakePy4JError(chain)) == {"XJ001", "40XL1"}


def test_data_echo_cannot_false_positive_when_chain_exists():
    """A message containing '23505' as DATA must not count when the real
    chain reports a non-retryable state."""
    from oic_options_chains_spark.sources.jdbc import (
        RETRYABLE_SQL_STATES,
        _sql_states,
    )

    exc = _FakePy4JError(_FakeThrowable(state="42X05"))
    exc.args = ("value '23505' violates something",)
    assert _sql_states(exc) & RETRYABLE_SQL_STATES == set()


def test_message_fallback_without_java_exception():
    from oic_options_chains_spark.sources.jdbc import _sql_states

    assert _sql_states(Exception("ERROR 23505: duplicate key")) == {"23505"}
    assert _sql_states(Exception("ERROR 42X05: no such table")) == set()


def test_cyclic_cause_chain_terminates():
    from oic_options_chains_spark.sources.jdbc import _sql_states

    a = _FakeThrowable(state="40001")
    a._cause = a  # self-referential cause
    assert _sql_states(_FakePy4JError(a)) == {"40001"}


# --- table_row_count: non-local sf_dir falls back, not crashes --------------


def test_row_count_remote_scheme_without_binding_raises_cleanly():
    from oic_options_chains_spark.sources.registry import table_row_count

    with pytest.raises(ValueError, match="filesystem binding"):
        table_row_count("s3-nonexistent-scheme://bucket/sf0.001", "documents")


def test_row_count_remote_scheme_falls_back_to_spark_count(spark, monkeypatch):
    from oic_options_chains_spark.sources import registry

    fallback = spark.range(7).withColumnRenamed("id", "doc_id")
    monkeypatch.setattr(
        registry, "load_table", lambda _spark, _sf, _name: fallback
    )
    n = registry.table_row_count(
        "s3-nonexistent-scheme://bucket/sf0.001", "documents", spark=spark
    )
    assert n == 7


def test_row_count_file_scheme_is_local(sf_dir):
    from oic_options_chains_spark.sources.registry import table_row_count

    assert table_row_count(f"file://{sf_dir}", "region") == table_row_count(
        sf_dir, "region"
    )


# --- BPE: the sequential-trainer rounds cap ---------------------------------


def test_bpe_rounds_cap_raises_loudly(spark):
    """VERDICT r9 item 7: each merge round is a driver round-trip
    (count -> collect(1) -> checkpoint); a GPT-scale rounds request must
    fail fast with the batched-top-k pointer, not run for hours."""
    from oic_options_chains_spark.operators.bpe import MAX_TRAIN_ROUNDS, bpe_train

    docs = spark.createDataFrame([(1, "ab ab")], ["doc_id", "text"])
    with pytest.raises(ValueError, match="MAX_TRAIN_ROUNDS"):
        bpe_train(docs, rounds=MAX_TRAIN_ROUNDS + 1)
    # at-cap requests stay legal (early-stops when no pair remains)
    assert bpe_train(docs, rounds=2).count() >= 1


# --- aHash hot-bucket refinement: exact at any cap ---------------------------
#
# Round-10 skew fix: the Zipf-template twin put ~6k images into single
# 16-bit band buckets, making the plain band equi-join quadratic (156M
# candidates, ~99% failing the Hamming verify; q_ahash_dedup 969 s ->
# 18.5 s after the fix). The hot tier pigeonholes AGAIN inside a hot
# bucket (the other 48 bits split into max_hamming+1 sub-bands), which
# must not change the result set at ANY cap value.


def _random_band_table(spark, seed=7, n=300):
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        # half the corpus shares band 0 (the planted hot bucket)
        b0 = 0xBEEF if i % 2 == 0 else rng.randrange(1 << 16)
        bands = [b0] + [rng.randrange(1 << 16) for _ in range(3)]
        rows.append((i * 2, bands))
        # a sibling within Hamming<=3: flip up to 3 random bits
        sib = list(bands)
        for _ in range(rng.randrange(4)):
            bit = rng.randrange(64)
            sib[bit // 16] ^= 1 << (bit % 16)
        rows.append((i * 2 + 1, sib))
    return spark.createDataFrame(
        rows, "__id long, __bands array<bigint>"
    ).localCheckpoint(eager=True)


def test_hot_bucket_tier_is_exact_at_any_cap(spark):
    from oic_options_chains_spark.operators.phash import pairs_from_band_table

    hashed = _random_band_table(spark)

    def pair_set(cap):
        return {
            (r.doc_a, r.doc_b, r.hamming)
            for r in pairs_from_band_table(
                hashed, max_hamming=3, hot_bucket_cap=cap
            ).collect()
        }

    all_normal = pair_set(10**9)  # tier 1 only (the pre-fix behavior)
    assert all_normal  # the planted siblings guarantee a non-empty set
    assert pair_set(0) == all_normal  # everything through the hot tier
    assert pair_set(64) == all_normal  # mixed: hot bucket split, rest normal


def test_hamming_from_bands_bit_count_matches_reference(spark):
    """The codegen'd bit_count(xor) verify equals a Python popcount over
    the same 64-bit values."""
    import random

    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.phash import hamming_from_bands

    rng = random.Random(3)
    rows = []
    for i in range(200):
        a = [rng.randrange(1 << 16) for _ in range(4)]
        b = [rng.randrange(1 << 16) for _ in range(4)]
        want = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
        rows.append((i, a, b, want))
    df = spark.createDataFrame(
        rows, "i long, a array<bigint>, b array<bigint>, want long"
    )
    bad = df.select(
        hamming_from_bands(F.col("a"), F.col("b")).alias("got"), "want"
    ).filter(F.col("got") != F.col("want"))
    assert bad.count() == 0


def test_incremental_hot_bucket_tier_is_exact(spark):
    """ahash_incremental's delta-vs-base join uses the same two-tier
    split keyed on BASE bucket sizes; results must match the plain join
    regardless. Exercised via a corpus whose base has a dominant shared
    band (every doc's text starts with the same long prefix)."""
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.phash import ahash_incremental

    prefix = "the same leading template sentence for every single doc "
    base = spark.createDataFrame(
        [(i, prefix + f"tail {i} " + "x" * (i % 7)) for i in range(60)],
        ["doc_id", "text"],
    )
    delta = base.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000).alias("doc_id"), F.upper("text").alias("text")
    )
    def run(cap):
        return {
            (r.doc_id, r.kept, r.dup_of, r.hamming)
            for r in ahash_incremental(
                base, delta, max_hamming=3, hot_bucket_cap=cap
            ).collect()
        }

    plain = run(10**9)  # tier-1 only (pre-fix behavior)
    assert len(plain) == delta.count()
    # the case-folded re-uploads must be caught as dups of their source
    assert {r for r in plain if r[1] == 0}, "no dups for case-folded re-uploads"
    assert run(0) == plain  # every bucket through the hot tier
    assert run(8) == plain  # mixed split


# --- LSH star edges: clique-equivalent clusters, linear in mega-buckets -----


def test_lsh_star_edges_equal_clique_components(spark):
    """Per-bucket hub stars have the same transitive closure as the full
    pair clique — components, keepers, and per-doc incidence identical —
    while an exact-dup mega-bucket (every copy shares every band key)
    costs N-1 edges instead of N^2/2."""
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.clusters import dedup_clusters
    from oic_options_chains_spark.operators.minhash import (
        doc_shingles,
        lsh_candidate_pairs,
        lsh_star_edges,
        minhash_band_keys,
    )

    # 40 exact copies (the mega-bucket) + near-dup chain + singletons
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [(i, base) for i in range(40)]
    rows += [(100, base + " lambda"), (101, base + " lambda mu")]
    rows += [(200, "entirely different text one two three four five six seven"),
             (201, "another unrelated document with its own words entirely")]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    bands = minhash_band_keys(
        doc_shingles(d, "doc_id", "text", distinct=False), "doc_id"
    ).localCheckpoint(eager=True)

    clique = lsh_candidate_pairs(bands, "doc_id")
    star = lsh_star_edges(bands, "doc_id")
    n_clique, n_star = clique.count(), star.count()
    assert n_star < n_clique  # 40-copy bucket: 780 clique pairs vs 39 stars
    assert n_star <= 41  # hub edges only (40-clique: 39; chain adds <=2)

    def verdict(edges):
        return sorted(
            (r.doc_id, r.cluster_id, r.is_keeper)
            for r in dedup_clusters(d, edges).collect()
        )

    assert verdict(star) == verdict(clique)
