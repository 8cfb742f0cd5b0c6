"""Bloom manifests and count-min sketch: the sketch guarantees."""

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.sketches import (
    bloom_probe,
    bloom_words,
    cms_counters,
    cms_estimate,
)


def _data(spark):
    rows = [(i % 4, i * 37 % 50) for i in range(400)]
    return spark.createDataFrame(rows, "bucket long, key long")


def test_bloom_never_false_negative(spark):
    df = _data(spark)
    manifest = bloom_words(df, F.col("key"), F.col("bucket"), m_bits=256, k=3)
    probes = df.select("key").distinct()
    maybe = {
        r.key: r.n_buckets_maybe
        for r in bloom_probe(manifest, probes, "key", m_bits=256, k=3).collect()
    }
    truth = {
        r.key: r.n
        for r in df.groupBy("key")
        .agg(F.count_distinct("bucket").alias("n"))
        .collect()
    }
    for k, t in truth.items():
        assert maybe[k] >= t, (k, maybe[k], t)


def test_bloom_manifests_merge_by_bit_or(spark):
    df = _data(spark)
    half_a = df.filter(F.col("key") < 25)
    half_b = df.filter(F.col("key") >= 25)
    whole = bloom_words(df, F.col("key"), F.col("bucket"), m_bits=256, k=3)
    parts = bloom_words(half_a, F.col("key"), F.col("bucket"), m_bits=256, k=3).unionAll(
        bloom_words(half_b, F.col("key"), F.col("bucket"), m_bits=256, k=3)
    )
    merged = parts.groupBy("bucket", "word_idx").agg(F.bit_or("word").alias("word"))
    got = sorted(tuple(r) for r in merged.collect())
    want = sorted(tuple(r) for r in whole.collect())
    assert got == want


def test_cms_upper_bounds_and_merges(spark):
    df = _data(spark)
    sketch = cms_counters(df, F.col("key"), depth=4, width=64)
    probes = df.select("key").distinct()
    est = {r.key: r.est for r in cms_estimate(sketch, probes, "key", depth=4, width=64).collect()}
    truth = {r.key: r.n for r in df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()}
    for k, t in truth.items():
        assert est[k] >= t
    # sketches merge by summing counters
    s_a = cms_counters(df.filter(F.col("key") < 25), F.col("key"), depth=4, width=64)
    s_b = cms_counters(df.filter(F.col("key") >= 25), F.col("key"), depth=4, width=64)
    merged = (
        s_a.unionAll(s_b)
        .groupBy("row_idx", "pos")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    assert sorted(tuple(r) for r in merged.collect()) == sorted(
        tuple(r) for r in sketch.collect()
    )


def test_cms_exact_when_no_collisions(spark):
    # 3 keys, width 64: md5 chunks of 3 keys rarely collide in ALL rows;
    # with depth 4 the min row is collision-free and the estimate exact
    rows = [(0, 1)] * 5 + [(0, 2)] * 3 + [(0, 3)] * 7
    df = spark.createDataFrame(rows, "bucket long, key long")
    sketch = cms_counters(df, F.col("key"), depth=4, width=64)
    probes = df.select("key").distinct()
    est = {r.key: r.est for r in cms_estimate(sketch, probes, "key", depth=4, width=64).collect()}
    assert est == {1: 5, 2: 3, 3: 7}


def test_cms_shard_merge_equals_direct(spark, sf_dir):
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.sketches import (
        cms_counters,
        cms_group_counters,
        cms_merge_counters,
    )
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "events")
    direct = cms_counters(e, F.col("user_id"))
    merged = cms_merge_counters(cms_group_counters(e, F.col("user_id"), "event_type"))
    key = lambda r: (r["row_idx"], r["pos"], r["cnt"])  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(map(key, direct.collect()))


def test_bloom_merge_equals_direct_build(spark, sf_dir):
    from pyspark.sql import functions as F

    from oic_options_chains_spark.operators.sketches import (
        bloom_merge_words,
        bloom_words,
    )
    from oic_options_chains_spark.sources.registry import load_table

    e = load_table(spark, sf_dir, "events")
    per_bucket = bloom_words(e, F.col("user_id"), F.col("event_type"))
    merged = bloom_merge_words(per_bucket)
    direct = bloom_words(e, F.col("user_id"), F.lit("all")).select(
        "word_idx", "word"
    )
    key = lambda r: (r["word_idx"], r["word"])  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(map(key, direct.collect()))
