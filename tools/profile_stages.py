"""Ad-hoc stage isolation for optimization rounds: time named
sub-pipelines of expensive registered queries with the noop sink
(guide §1.4) so per-change evidence targets the stage that actually
costs, not the whole query. Not part of the suite; run on a quiet box.

    python tools/profile_stages.py knn pq ensemble ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("PROFILE_RUNS", "3"))


def noop_time(spark, label, df_builder):
    """min-of-RUNS wall seconds to fully materialize the builder's
    DataFrame through the noop sink (every column of every row)."""
    best = float("inf")
    for _ in range(RUNS):
        t0 = time.perf_counter()
        df = df_builder()
        spark.sparkContext.setJobDescription(label)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"  {label:46s} {best:7.3f}s")
    return best


def profile_knn(spark):
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.graph import (
        bucketed_knn_edges,
        knn_from_candidates,
        mutual_edges,
    )
    from oic_options_chains_spark.operators.kmeans import QUANT
    from oic_options_chains_spark.operators.similarity import _resolve_bits
    from oic_options_chains_spark.sources.registry import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    print("== kNN graph family (q_kcore / q_anf / q_knn_triangles) ==")

    bits = _resolve_bits(emb, None)
    sign = F.concat(
        *[
            F.when(F.element_at(F.col("embedding"), i + 1) > 0, F.lit("1"))
            .otherwise(F.lit("0"))
            for i in range(bits)
        ]
    )

    def q_stage():
        return emb.select(
            F.col("vec_id"),
            F.transform(
                "embedding", lambda x: F.floor(x.cast("double") * QUANT)
            ).alias("qarr"),
            sign.alias("__b"),
        )

    noop_time(spark, "knn: quantize+bucket projection", q_stage)

    def pairs_stage():
        from oic_options_chains_spark.operators.graph import _l2_int
        from oic_options_chains_spark.operators.similarity import (
            _probe_partitions,
        )

        q = q_stage()
        a = q.select(
            F.col("vec_id").alias("src"), F.col("qarr").alias("__qa"), "__b"
        )
        b = q.select(
            F.col("vec_id").alias("dst"), F.col("qarr").alias("__qb"), "__b"
        )
        a = a.repartition(_probe_partitions(emb), F.col("src"))
        b = F.broadcast(b)
        return (
            a.join(b, "__b")
            .filter(F.col("src") != F.col("dst"))
            .select(
                "src", "dst", _l2_int(F.col("__qa"), F.col("__qb")).alias("dist")
            )
        )

    noop_time(spark, "knn: bucket join + L2 distances", pairs_stage)
    noop_time(
        spark,
        "knn: + top-6 window",
        lambda: knn_from_candidates(pairs_stage(), 6),
    )
    noop_time(
        spark,
        "knn: + mutual_edges",
        lambda: mutual_edges(
            bucketed_knn_edges(emb, k=6, broadcast_candidates=True)
        ),
    )


def profile_kcore(spark):
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.graph import (
        bucketed_knn_edges,
        kcore_membership,
        mutual_edges,
    )
    from oic_options_chains_spark.sources.registry import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    print("== q_kcore full ==")

    def full():
        edges = mutual_edges(
            bucketed_knn_edges(emb, k=6, broadcast_candidates=True)
        ).select(F.col("a").alias("src"), F.col("b").alias("dst"))
        return kcore_membership(
            emb.select(F.col("vec_id").alias("node")), edges, k=3, rounds=8
        )

    noop_time(spark, "kcore: full query", full)


def profile_pq(spark):
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.kmeans import kmeans_fit, quantize
    from oic_options_chains_spark.operators.pq import _pq_fit_qv, pq_fit
    from oic_options_chains_spark.queries.clustering import (
        _ITERS,
        _K,
        _K_SUB,
        _N_SUB,
        _SUB_DIM,
        _spread,
    )
    from oic_options_chains_spark.sources.registry import load_table

    e = _spread(load_table(spark, SF_DIR, "embeddings"))
    print("== PQ family (q_ann_pq_rerank / q_ann_pq_batch / q_ann_ivf_pq) ==")
    noop_time(spark, "pq: quantize only", lambda: quantize(e))

    def coarse():
        assigned, cents = kmeans_fit(e, k=_K, iters=_ITERS)
        return assigned

    noop_time(spark, "pq: coarse kmeans_fit assigned", coarse)

    def coded():
        c, books = pq_fit(
            e, n_sub=_N_SUB, k_sub=_K_SUB, iters=_ITERS, sub_dim=_SUB_DIM
        )
        return c

    noop_time(spark, "pq: pq_fit coded", coded)

    def full():
        from oic_options_chains_spark.operators.pq import ivf_pq_topk

        return ivf_pq_topk(
            e, query_id=0, coarse_k=_K, n_probe=2, n_sub=_N_SUB,
            k_sub=_K_SUB, iters=_ITERS, topk=5, rerank=50,
        )

    noop_time(spark, "pq: ivf_pq_topk rerank=50 (full)", full)


def profile_ensemble(spark):
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.clusters import (
        connected_components,
        ensemble_dedup,
        exact_star_edges,
    )
    from oic_options_chains_spark.operators.minhash import (
        doc_shingles,
        lsh_star_edges,
        minhash_band_keys,
    )
    from oic_options_chains_spark.operators.similarity import (
        bits_for,
        near_dup_pairs,
    )
    from oic_options_chains_spark.sources.registry import (
        load_table,
        table_row_count,
    )

    d = load_table(spark, SF_DIR, "documents")
    e = load_table(spark, SF_DIR, "embeddings")
    print("== q_dedup_ensemble stages ==")
    noop_time(
        spark,
        "ens: doc_shingles",
        lambda: doc_shingles(d, "doc_id", "text", distinct=False),
    )
    noop_time(
        spark,
        "ens: minhash_band_keys",
        lambda: minhash_band_keys(
            doc_shingles(d, "doc_id", "text", distinct=False), "doc_id"
        ),
    )
    noop_time(
        spark,
        "ens: lsh_star_edges",
        lambda: lsh_star_edges(
            minhash_band_keys(
                doc_shingles(d, "doc_id", "text", distinct=False), "doc_id"
            ),
            "doc_id",
        ),
    )
    noop_time(spark, "ens: exact_star_edges", lambda: exact_star_edges(d))

    def emb_pairs():
        return near_dup_pairs(
            e,
            threshold=0.35,
            bits=bits_for(
                table_row_count(SF_DIR, "embeddings", spark=spark),
                target_bucket_rows=256,
            ),
            broadcast_candidates=True,
        )

    noop_time(spark, "ens: near_dup_pairs(embeddings)", emb_pairs)

    def all_edges_cc():
        bands = minhash_band_keys(
            doc_shingles(d, "doc_id", "text", distinct=False), "doc_id"
        )
        lsh = lsh_star_edges(bands, "doc_id")
        emb = emb_pairs().select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        )
        return ensemble_dedup(d, {1: exact_star_edges(d), 2: lsh, 4: emb})

    noop_time(spark, "ens: full ensemble_dedup", all_edges_cc)


def profile_jl(spark):
    from oic_options_chains_spark.queries import QUERIES

    print("== q_random_projection ==")
    noop_time(
        spark,
        "jl: full query (noop)",
        lambda: QUERIES["q_random_projection"](spark, SF_DIR),
    )


PROFILES = {
    "knn": profile_knn,
    "kcore": profile_kcore,
    "pq": profile_pq,
    "ensemble": profile_ensemble,
    "jl": profile_jl,
}


def main() -> None:
    from oic_options_chains_spark.queries import QUERIES
    from oic_options_chains_spark.session import get_spark

    spark = get_spark(app_name="oic-profile-stages")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["q_group_count"](spark, SF_DIR).count()  # warm-up

    for name in sys.argv[1:] or list(PROFILES):
        PROFILES[name](spark)
    spark.stop()


if __name__ == "__main__":
    main()
