"""Lloyd k-means: determinism, invariants, IVF retrieval, plan shape."""

import pytest
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.kmeans import (
    assign_clusters,
    ivf_kmeans_topk,
    kmeans_fit,
    quantize,
)
from oic_options_chains_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_assignment_partition_invariant(spark, emb):
    """The exactness claim: integer moments + fixed-shape double distance
    mean assignments cannot drift with input partitioning."""
    a1, _ = kmeans_fit(emb.repartition(1), k=8, iters=2)
    a7, _ = kmeans_fit(emb.repartition(7, "label"), k=8, iters=2)
    r1 = sorted((r.vec_id, r.cid) for r in a1.collect())
    r7 = sorted((r.vec_id, r.cid) for r in a7.collect())
    assert r1 == r7


def test_every_vector_assigned_once(emb):
    assigned, centroids = kmeans_fit(emb, k=8, iters=2)
    n_vec = emb.count()
    rows = assigned.groupBy("vec_id").count().filter("count != 1").count()
    assert rows == 0
    assert assigned.count() == n_vec
    cents = centroids.collect()
    assert 1 <= len(cents) <= 8
    # member counts in the centroid state reconcile with assignments
    assert sum(c.n for c in cents) == n_vec


def test_centroid_moments_are_exact_integers(emb):
    """ss and n in the centroid state reproduce a direct recomputation
    from the assignment — the invariant the distance expansion needs."""
    assigned, centroids = kmeans_fit(emb, k=4, iters=1)
    direct = (
        assigned.select("cid", F.posexplode("qarr").alias("pos", "q"))
        .groupBy("cid", "pos")
        .agg(F.sum("q").alias("s"))
        .groupBy("cid")
        .agg(F.sum(F.col("s") * F.col("s")).alias("ss"))
    )
    got = {r.cid: r.ss for r in centroids.select("cid", "ss").collect()}
    want = {r.cid: r.ss for r in direct.collect()}
    assert got == want


def test_ivf_kmeans_topk_matches_bruteforce_within_probed_cells(spark, emb):
    res = ivf_kmeans_topk(emb, query_id=0, k=8, iters=2, n_probe=8, topk=5)
    rows = res.collect()
    assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == [1, 2, 3, 4, 5]
    assert all(r.vec_id != 0 for r in rows)
    # with n_probe = k (all cells probed) the result IS brute force
    qv = quantize(emb)
    q0 = qv.filter("vec_id = 0").collect()[0].qarr
    brute = (
        qv.filter("vec_id != 0")
        .select(
            "vec_id",
            F.aggregate(
                F.zip_with(
                    "qarr",
                    F.array(*[F.lit(v) for v in q0]),
                    lambda x, y: (x - y) * (x - y),
                ),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + v,
            ).alias("dist"),
        )
        .orderBy("dist", "vec_id")
        .limit(5)
        .collect()
    )
    assert [(r.vec_id, r.dist) for r in sorted(rows, key=lambda r: r.rank)] == [
        (r.vec_id, r.dist) for r in brute
    ]


def test_assign_is_shuffle_free(spark, emb):
    """Assignment must stay a broadcast-fold projection: no Exchange in
    its plan (the zero-shuffle-per-iteration property)."""
    qv = quantize(emb)
    seeds = qv.filter(F.col("vec_id") < 4).select(
        "vec_id", "qarr", F.col("vec_id").alias("cid")
    )
    from oic_options_chains_spark.operators.kmeans import _centroid_state

    cents = _centroid_state(seeds)
    plan = (
        assign_clusters(qv, cents)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exchanges exist only below the broadcast (centroid state is k rows);
    # the probe side — scan to projection — must have none
    import re

    main_branch = plan.split("BroadcastExchange")[0]
    assert not re.search(r"\bExchange (hash|range)", main_branch)


def test_empty_cluster_drops_not_crashes(spark):
    # two far groups, 3 seeds: one seed cell must lose all members
    rows = [(i, [float(i % 2 * 100)] * 4) for i in range(20)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned, centroids = kmeans_fit(df, k=3, iters=2)
    assert assigned.count() == 20
    assert centroids.count() <= 3


def test_sparse_id_space_seeds_full_k(spark, emb):
    """Seeding takes the k lowest ids ACTUALLY PRESENT (sort-limit), not
    ``vec_id < k`` — on a sparse/offset id space the old predicate
    silently trained fewer cells (the q_drift_cells even-id monitor
    trained 4 of 8). Shifting every id by +1000 must leave the cluster
    STRUCTURE identical: same seed rows, same members, ids offset."""
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 1000)
    a0, c0 = kmeans_fit(emb, k=8, iters=1)
    a1, c1 = kmeans_fit(shifted, k=8, iters=1)
    assert c1.count() == c0.count()
    r0 = sorted((r.vec_id + 1000, r.cid + 1000) for r in a0.collect())
    r1 = sorted((r.vec_id, r.cid) for r in a1.collect())
    assert r0 == r1


def test_even_id_half_trains_k_cells(spark, emb):
    """The drift-monitor shape: training on the even-id half must still
    seed k cells (the 8 lowest even ids), not k/2."""
    ref = emb.filter(F.col("vec_id") % 2 == 0)
    _, cents = kmeans_fit(ref, k=8, iters=1)
    cids = sorted(r.cid for r in cents.select("cid").collect())
    assert len(cids) == 8
    assert all(c % 2 == 0 for c in cids)


def test_iters_zero_raises(spark, emb):
    with pytest.raises(ValueError, match="iters"):
        kmeans_fit(emb, k=4, iters=0)
    from oic_options_chains_spark.operators.pq import pq_fit

    with pytest.raises(ValueError, match="iters"):
        pq_fit(emb, iters=0)


def test_centroid_probe_confusion_matrix(spark, emb):
    from oic_options_chains_spark.operators.kmeans import centroid_probe

    rows = centroid_probe(emb).collect()
    total = sum(r.n_vecs for r in rows)
    assert total == emb.count()  # every vector classified exactly once
    labels = {r.label for r in rows}
    assert labels == set(range(10))
    # the synthetic space carries real label signal: the diagonal must
    # beat chance (10 classes) by a wide margin
    diag = sum(r.n_vecs for r in rows if r.label == r.predicted)
    assert diag / total > 0.2
    # partition invariance of the whole matrix (integer-moment argmin)
    again = centroid_probe(emb.repartition(7, "label")).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_semdedup_sub_bits_is_sound_subset(spark, sf_dir):
    """The sub_bits scale knob may MISS pairs (sub-bucket boundaries)
    but must never INVENT them: every (vec_id, keeper) it reports must
    be a pair the exact operator also reports (same cid), with dist
    identical, and keeper >= the exact keeper (a missed lower-id
    neighbor can only move the keeper up)."""
    from oic_options_chains_spark.operators.kmeans import semantic_dedup
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "embeddings")
    eps = 22_000_000
    exact = {
        r.vec_id: (r.cid, r.keeper, r.dist)
        for r in semantic_dedup(e, eps=eps, k=8, iters=2).collect()
    }
    sub = semantic_dedup(e, eps=eps, k=8, iters=2, sub_bits=3).collect()
    assert len(sub) <= len(exact)
    for r in sub:
        assert r.vec_id in exact, "invented a duplicate the exact op lacks"
        cid, keeper, dist = exact[r.vec_id]
        assert r.cid == cid
        assert r.keeper >= keeper
        if r.keeper == keeper:
            assert r.dist == dist
