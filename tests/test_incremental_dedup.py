"""Delta-vs-base incremental dedup (operators/minhash.incremental_lsh_dedup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.minhash import incremental_lsh_dedup


def test_exact_copy_of_base_doc_is_dropped(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = d.filter(F.col("doc_id") % 10 < 8).select("doc_id", "text")
    # delta: one verbatim copy of a base doc (new id) + one novel doc
    src = base.orderBy("doc_id").first()
    delta = spark.createDataFrame(
        [
            (10_000_001, src["text"]),
            (10_000_002, "completely novel sentence about nothing seen before ever again anywhere"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in incremental_lsh_dedup(base, delta).collect()}
    assert out[10_000_001]["kept"] == 0
    assert out[10_000_001]["dup_of"] == src["doc_id"]
    assert out[10_000_001]["jaccard_bp"] == 10000
    assert out[10_000_002]["kept"] == 1
    assert out[10_000_002]["dup_of"] is None


def test_every_delta_doc_gets_exactly_one_verdict(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = d.filter(F.col("doc_id") % 10 < 8)
    delta = d.filter(F.col("doc_id") % 10 >= 8)
    out = incremental_lsh_dedup(base, delta)
    assert out.count() == delta.count()
    assert out.select("doc_id").distinct().count() == delta.count()
    # dropped rows always carry a verified match at/above threshold
    bad = out.filter(
        (F.col("kept") == 0)
        & (F.col("dup_of").isNull() | (F.col("jaccard_bp") < 2000))
    ).count()
    assert bad == 0


def test_no_base_self_pairing_in_plan(spark, sf_dir):
    """The base index must join the DELTA's band keys, never itself: the
    candidate join's two scan legs carry disjoint doc_id pushed filters,
    and there is no cartesian anywhere."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = d.filter(F.col("doc_id") % 10 < 8)
    delta = d.filter(F.col("doc_id") % 10 >= 8)
    plan = (
        incremental_lsh_dedup(base, delta)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
