"""Unit tests for exact stratified splitting, distributed global rank,
curriculum bins, snapshot diff, and bigram coverage."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.cdc import snapshot_diff
from oic_options_chains_spark.operators.lm import bigram_coverage
from oic_options_chains_spark.operators.sampling import (
    global_rank,
    rank_bins,
    stratified_split,
)


def test_stratified_split_exact_proportions(spark):
    # 3 strata with deliberately unequal sizes, including one too small
    # to fund test/val at all (n=7 -> floor(7*5/100)=0).
    rows = (
        [(i, "big") for i in range(200)]
        + [(200 + i, "mid") for i in range(40)]
        + [(240 + i, "tiny") for i in range(7)]
    )
    df = spark.createDataFrame(rows, "id bigint, stratum string")
    out = stratified_split(df, ["stratum"], "id").groupBy("stratum", "split").count()
    got = {(r["stratum"], r["split"]): r["count"] for r in out.collect()}
    assert got[("big", "test")] == 10 and got[("big", "val")] == 10
    assert got[("big", "train")] == 180
    assert got[("mid", "test")] == 2 and got[("mid", "val")] == 2
    assert got[("mid", "train")] == 36
    # the tiny stratum funds nothing but still fully lands in train
    assert got.get(("tiny", "test"), 0) == 0
    assert got.get(("tiny", "val"), 0) == 0
    assert got[("tiny", "train")] == 7


def test_stratified_split_deterministic(spark):
    df = spark.createDataFrame(
        [(i, "s") for i in range(50)], "id bigint, stratum string"
    )
    a = {r["id"]: r["split"] for r in stratified_split(df, ["stratum"], "id").collect()}
    b = {
        r["id"]: r["split"]
        for r in stratified_split(df.repartition(7), ["stratum"], "id").collect()
    }
    assert a == b


def test_global_rank_matches_single_window(spark):
    df = spark.createDataFrame(
        [(i % 13, i) for i in range(500)], "v bigint, id bigint"
    ).repartition(11)
    got = global_rank(df, ["v", "id"], num_ranges=5)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want = df.withColumn("rank", F.row_number().over(w).cast("bigint"))
    assert got.orderBy("rank").collect() == want.orderBy("rank").collect()


def test_global_rank_is_a_permutation(spark):
    df = spark.createDataFrame([(i,) for i in range(321)], "id bigint")
    ranks = [r["rank"] for r in global_rank(df, ["id"], num_ranges=4).collect()]
    assert sorted(ranks) == list(range(1, 322))


def test_rank_bins_even_counts(spark):
    df = spark.createDataFrame([(i,) for i in range(103)], "id bigint")
    out = rank_bins(df, ["id"], n_bins=10).groupBy("bin").count().collect()
    counts = {r["bin"]: r["count"] for r in out}
    assert set(counts) == set(range(1, 11))
    assert all(10 <= c <= 11 for c in counts.values())
    assert sum(counts.values()) == 103


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, fp string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "k bigint, fp string"
    )
    got = {r["k"]: (r["status"], r["old_fp"], r["new_fp"])
           for r in snapshot_diff(old, new, "k").collect()}
    assert got[1] == ("removed", "a", None)
    assert got[2] == ("kept", "b", "b")
    assert got[3] == ("changed", "c", "C")
    assert got[4] == ("added", None, "d")


def test_bigram_coverage_hand_counts(spark):
    # "x y" appears in 3 docs (meets min_df=3); "y z" in 1; one-token doc
    # has no bigrams at all but must still appear with zeros.
    docs = spark.createDataFrame(
        [
            (1, "x y z"),       # bigrams: "x y" (hit), "y z" (miss)
            (2, "x y"),         # "x y" (hit)
            (3, "q x y"),       # "q x" (miss), "x y" (hit)
            (4, "solo"),        # no bigrams
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: (r["n_bigrams"], r["n_hits"])
           for r in bigram_coverage(docs, min_df=3).collect()}
    assert got[1] == (2, 1)
    assert got[2] == (1, 1)
    assert got[3] == (2, 1)
    assert got[4] == (0, 0)


def test_rank_bins_corpus_window_partitions_by_leading_value(spark):
    # The corpus-sized window must partition by the leading order value
    # (parallel across values); only the bounded offset relation may see
    # a partition-less cumsum.
    df = spark.createDataFrame(
        [(i % 17, i) for i in range(100)], "v bigint, id bigint"
    )
    plan = (
        rank_bins(df, ["v", "id"], n_bins=4)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "windowspecdefinition(v#" in plan


def test_global_rank_deterministic_across_plan_consumers(spark):
    # Two consumers of one global_rank plan inside a SINGLE action must
    # see identical ranks — the regression that sampled range boundaries
    # caused: offsets and local ranks materialized with different
    # partitionings, silently corrupting assembled ranks.
    df = spark.createDataFrame(
        [(i % 29, i) for i in range(2000)], "v bigint, id bigint"
    ).repartition(13)
    ranked = global_rank(df, ["v", "id"])
    a, b = ranked.alias("a"), ranked.alias("b")
    joined = a.join(b, F.col("a.id") == F.col("b.id")).filter(
        F.col("a.rank") != F.col("b.rank")
    )
    assert joined.count() == 0
    ranks = sorted(r["rank"] for r in ranked.collect())
    assert ranks == list(range(1, 2001))


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(st.integers(min_value=1, max_value=120), min_size=1, max_size=6))
def test_stratified_split_floor_exact_for_any_strata(spark, sizes):
    # For EVERY stratum size n: test gets floor(n*5/100), val gets
    # floor(n*10/100) - floor(n*5/100), train the rest — the floor-exact
    # contract, regardless of how lopsided the strata are.
    rows, base = [], 0
    for gi, n in enumerate(sizes):
        rows += [(base + i, f"s{gi}") for i in range(n)]
        base += n
    df = spark.createDataFrame(rows, "id bigint, stratum string")
    out = stratified_split(df, ["stratum"], "id").groupBy("stratum", "split").count()
    got = {(r["stratum"], r["split"]): r["count"] for r in out.collect()}
    for gi, n in enumerate(sizes):
        s = f"s{gi}"
        want_test = n * 5 // 100
        want_val = n * 10 // 100 - want_test
        assert got.get((s, "test"), 0) == want_test, (s, n)
        assert got.get((s, "val"), 0) == want_val, (s, n)
        assert got.get((s, "train"), 0) == n - want_test - want_val, (s, n)
