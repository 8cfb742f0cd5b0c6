"""Optimization r15: the vectorized JL projection kernel is
bit-identical to the expression tier it replaces for batch inputs.

``jl_project`` routes batch inputs with a known width through
``_jl_kernel`` (one numpy int64 matmul per Arrow batch); streaming and
unknown-width inputs keep the staged expression tier. The projection is
pure integer math after one IEEE double multiply+floor that both tiers
perform identically, so the kernel may never move a value: this pins
kernel == expression row-for-row on the real embeddings table plus the
awkward shapes (NULL vector, negative components, zero components), and
pins the loud-failure contracts (width mismatch raises in both tiers).
"""

from __future__ import annotations

import pytest

from oic_options_chains_spark.operators.projection import (
    _jl_expression,
    _jl_kernel,
    jl_project,
)


def _as_map(df):
    return {
        r["vec_id"]: (
            None if r["proj"] is None else tuple(r["proj"]),
            r["norm_ratio_bp"],
        )
        for r in df.collect()
    }


def test_jl_kernel_matches_expression_tier(spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = _as_map(_jl_kernel(e, "embedding", 16, 64))
    want = _as_map(_jl_expression(e, "embedding", 16, in_dim=64))
    assert got == want
    assert len(got) > 0


def test_jl_kernel_edge_shapes(spark):
    rows = [
        (1, [0.5] * 8),
        (2, None),
        (3, [-0.75, 0.25, -1.5, 2.0, 0.0, -0.001, 0.999, -0.999]),
        (4, [1e-3] * 8),
    ]
    d = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = _as_map(_jl_kernel(d, "embedding", 4, 8))
    want = _as_map(_jl_expression(d, "embedding", 4, in_dim=8))
    assert got == want
    assert got[2] == (None, None)


def test_jl_kernel_zero_norm_raises_like_ansi_div(spark):
    # floor(1e-5 * 4096) == 0 in every component -> zero-norm audit
    # denominator; the expression tier raises ANSI DIVIDE_BY_ZERO, the
    # kernel raises its own loud error rather than silently diverging
    d = spark.createDataFrame(
        [(1, [1e-5] * 8)], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(Exception, match="zero-norm|DIVIDE_BY_ZERO"):
        _jl_kernel(d, "embedding", 4, 8).collect()
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO"):
        _jl_expression(d, "embedding", 4, in_dim=8).collect()


def test_jl_kernel_width_mismatch_raises(spark):
    d = spark.createDataFrame(
        [(1, [0.5] * 8), (2, [0.5] * 7)],
        "vec_id bigint, embedding array<double>",
    )
    with pytest.raises(Exception, match="width 7 != in_dim 8"):
        _jl_kernel(d, "embedding", 4, 8).collect()
    with pytest.raises(Exception, match="width 7 != in_dim 8"):
        _jl_expression(d, "embedding", 4, in_dim=8).collect()


def test_jl_project_routes_batch_to_kernel(spark):
    d = spark.createDataFrame(
        [(1, [0.5] * 8)], "vec_id bigint, embedding array<double>"
    )
    plan = (
        jl_project(d, out_dim=4, in_dim=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
