"""Z-order keys and pruning manifests."""

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.layout import (
    partition_stats,
    zorder_key,
    zorder_key_sql,
)


def _interleave(a, b, bits=16):
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def test_zorder_key_matches_hand_interleave(spark):
    rows = [(a, b) for a in (0, 1, 5, 255, 65535) for b in (0, 2, 9, 1023)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], bits=16).alias("z")
    ).collect()
    for r in got:
        assert r.z == _interleave(r.a, r.b), (r.a, r.b)


def test_zorder_sql_equals_column_form(spark):
    df = spark.range(500).select(
        (F.col("id") * 7 % 1024).alias("a"), (F.col("id") * 13 % 512).alias("b")
    )
    both = df.select(
        zorder_key([F.col("a"), F.col("b")], bits=10).alias("zc"),
        F.expr(zorder_key_sql(["a", "b"], bits=10)).cast("bigint").alias("zs"),
    )
    assert both.filter(F.col("zc") != F.col("zs")).count() == 0


def test_zorder_buckets_bound_both_dimensions(spark):
    # uniform 64x64 grid; 16 z-buckets must each span at most a 16x16 tile
    # per dimension — the two-dimensional locality single-column sorting
    # cannot give (sorting by a alone leaves b's range at the full 64).
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b")
    )
    z = grid.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], bits=6).alias("z")
    )
    stats = partition_stats(z, F.shiftright(F.col("z"), 8), ["a", "b"]).collect()
    assert len(stats) == 16
    for r in stats:
        assert r.n_rows == 256
        assert r.max_a - r.min_a <= 15
        assert r.max_b - r.min_b <= 15


def test_zorder_key_width_guard(spark):
    import pytest

    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b")], bits=32)


def test_partition_stats_manifest(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 5)], "p long, v long"
    )
    got = {r.bucket: r for r in partition_stats(df, F.col("p"), ["v"]).collect()}
    assert got[1].n_rows == 2 and got[1].min_v == 10 and got[1].max_v == 20
    assert got[2].n_rows == 1 and got[2].min_v == 5 and got[2].max_v == 5
