"""Data-profiling operators: functional-dependency mining.

A training-data warehouse inherits upstream tables whose documented
keys/dependencies drift (the reference's own schema guards its PKs in
the database, schema.sql:23; a lakehouse has no engine to enforce them).
FD profiling is the discovery side of that contract: for candidate
``lhs -> rhs`` dependencies, the exact violation count (the g3 error of
Kivinen & Mannila: the minimum number of rows to delete for the FD to
hold) plus the distinct-cardinality evidence. Metanome/HyFD-style
exhaustive lattice search is deliberately out of scope — at 100 TB you
profile a CURATED candidate list (keys you believe, joins you plan),
not the power set.

Scale shape: all candidates are verified in ONE pass — each row
explodes to one (fd, lhs, rhs) triple per candidate (row-local), then
three cascading hash aggregations, every one with map-side partial
combine: (fd, lhs, rhs) counts -> per-(fd, lhs) max/sum -> per-fd
totals. The shuffled volume is bounded by the candidates' distinct
(lhs, rhs) domains, never the row count; no joins, no windows, no
driver collect.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fd_profile(
    df: DataFrame, candidates: Sequence[tuple[str, str]]
) -> DataFrame:
    """Exact FD verification for ``(lhs_col, rhs_col)`` candidates.

    Returns one row per candidate: ``fd`` ("lhs->rhs"), ``n_rows``
    (non-filtered row count), ``n_lhs`` / ``n_pairs`` (distinct lhs and
    (lhs, rhs) counts), ``violations`` (g3: rows minus the sum over lhs
    groups of the majority rhs count — 0 iff the FD holds exactly) and
    ``holds`` (int flag). NULLs group as values on both engines, so a
    NULL rhs under one lhs counts like any other conflicting value.
    """
    if not candidates:
        raise ValueError("fd_profile needs at least one (lhs, rhs) candidate")
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(f"{lhs}->{rhs}").alias("fd"),
                        F.col(lhs).cast("string").alias("lhs"),
                        F.col(rhs).cast("string").alias("rhs"),
                    )
                    for lhs, rhs in candidates
                ]
            )
        ).alias("c")
    ).select("c.fd", "c.lhs", "c.rhs")
    pair_counts = stacked.groupBy("fd", "lhs", "rhs").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    per_lhs = pair_counts.groupBy("fd", "lhs").agg(
        F.sum("n").alias("grp_rows"),
        F.max("n").alias("keep_rows"),
        F.count(F.lit(1)).alias("n_rhs"),
    )
    return (
        per_lhs.groupBy("fd")
        .agg(
            F.sum("grp_rows").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_lhs"),
            F.sum("n_rhs").cast("bigint").alias("n_pairs"),
            (F.sum("grp_rows") - F.sum("keep_rows"))
            .cast("bigint")
            .alias("violations"),
        )
        .withColumn("holds", (F.col("violations") == 0).cast("int"))
    )


def fd_profile_oracle_sql(
    table: str, candidates: Sequence[tuple[str, str]]
) -> str:
    """The DuckDB mirror of :func:`fd_profile` — one UNION ALL block per
    candidate over the same grouped counts (the oracle optimizes for
    checkability, not scale)."""
    blocks = []
    for lhs, rhs in candidates:
        blocks.append(
            f"""
    SELECT '{lhs}->{rhs}' AS fd,
           CAST(SUM(grp_rows) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_lhs,
           CAST(SUM(n_rhs) AS BIGINT) AS n_pairs,
           CAST(SUM(grp_rows) - SUM(keep_rows) AS BIGINT) AS violations,
           CAST(CASE WHEN SUM(grp_rows) = SUM(keep_rows) THEN 1 ELSE 0 END
                AS INT) AS holds
    FROM (
      SELECT lhs, SUM(n) AS grp_rows, MAX(n) AS keep_rows,
             COUNT(*) AS n_rhs
      FROM (
        SELECT CAST({lhs} AS VARCHAR) AS lhs,
               CAST({rhs} AS VARCHAR) AS rhs, COUNT(*) AS n
        FROM {table} GROUP BY 1, 2)
      GROUP BY lhs)"""
        )
    return "\nUNION ALL".join(blocks)
