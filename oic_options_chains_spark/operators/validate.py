"""Referential-integrity validation (SURVEY.md J5).

The reference enforces FKs in PostgreSQL DDL (reference:
schema.sql:24-26,48-50,59); on a data lake that becomes an explicit
anti-join audit: rows whose key has no match in the dimension.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_violations(
    fact: DataFrame,
    dim: DataFrame,
    fact_keys: Sequence[str],
    dim_keys: Sequence[str] | None = None,
) -> DataFrame:
    """Fact rows violating the FK. Dimension side is projected to its key
    and broadcast when small; empty result means the constraint holds."""
    dim_keys = list(dim_keys or fact_keys)
    dim_proj = dim.select(
        *[F.col(d).alias(f) for d, f in zip(dim_keys, fact_keys)]
    ).distinct()
    return fact.join(F.broadcast(dim_proj), on=list(fact_keys), how="left_anti")


def quality_report(
    df: DataFrame,
    not_null: Sequence[str] = (),
    ranges: Sequence[tuple[str, int, int]] = (),
    enums: Sequence[tuple[str, Sequence[str]]] = (),
    unique: Sequence[str] | None = None,
) -> DataFrame:
    """One (check, n_violations, n_checked) row per declared constraint —
    the Deequ-style expectation suite over a table, as a single plan.

    All row-local checks (NOT NULL, numeric range, enum membership) fold
    into ONE conditional-aggregation pass over the relation — one scan,
    one metadata-sized result, regardless of how many checks run. The
    uniqueness check is the only keyed aggregate (count over the
    candidate key, violations = rows beyond the first per key), sharing
    the scan via self-contained lineage. Every count is an exact
    integer; the report is the audit artifact a warehouse load gates on
    (the lake-side analog of the reference's DDL constraints,
    schema.sql:24-26,48-50 — violations surface as data, not as load
    failures).

    Scale: conditional aggregation is map-side combined (result is one
    row per plan, CHECKS wide); uniqueness shuffles once on the key.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    names: list[str] = []
    for c in not_null:
        names.append(f"not_null:{c}")
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(names[-1])
        )
    for c, lo, hi in ranges:
        names.append(f"range:{c}[{lo},{hi}]")
        aggs.append(
            F.sum(
                F.when(
                    F.col(c).isNull()
                    | (F.col(c) < F.lit(lo))
                    | (F.col(c) > F.lit(hi)),
                    1,
                ).otherwise(0)
            ).alias(names[-1])
        )
    for c, allowed in enums:
        names.append(f"enum:{c}")
        aggs.append(
            F.sum(
                F.when(~F.col(c).isin(*list(allowed)), 1).otherwise(0)
            ).alias(names[-1])
        )
    row = df.agg(*aggs)
    reports = [
        row.select(
            F.lit(name).alias("check"),
            F.col(name).cast("bigint").alias("n_violations"),
            F.col("__n").cast("bigint").alias("n_checked"),
        )
        for name in names
    ]
    out = None
    for r in reports:
        out = r if out is None else out.unionByName(r)
    if unique:
        dup = (
            df.groupBy(*[F.col(c) for c in unique])
            .agg(F.count(F.lit(1)).alias("__k"))
            .agg(
                F.coalesce(F.sum(F.col("__k") - 1), F.lit(0)).alias("__viol"),
                F.coalesce(F.sum("__k"), F.lit(0)).alias("__n"),
            )
            .select(
                F.lit("unique:" + ",".join(unique)).alias("check"),
                F.col("__viol").cast("bigint").alias("n_violations"),
                F.col("__n").cast("bigint").alias("n_checked"),
            )
        )
        out = dup if out is None else out.unionByName(dup)
    assert out is not None, "declare at least one check"
    return out


def implication_audit(
    df: DataFrame, rules: dict[str, tuple[F.Column, F.Column]]
) -> DataFrame:
    """Conditional-functional-dependency audit: for each named rule
    (antecedent, consequent), count the rows the rule APPLIES to and the
    rows that VIOLATE it (antecedent true, consequent not true) — the
    cross-table sibling of quality_report's row-local expectations
    (e.g. "a finalized order must have every line shipped").

    One conditional-aggregation pass over ``df`` for ALL rules (no
    per-rule scans), exploded to one audit row per rule:
    (check, n_applicable, n_violations). NULL consequents count as
    violations — an unverifiable implication is a violation, not a
    pass."""
    aggs = []
    for i, (ante, cons) in enumerate(rules.values()):
        applies = ante.cast("boolean")
        holds = F.coalesce(cons.cast("boolean"), F.lit(False))
        aggs.append(
            F.sum(F.when(applies, 1).otherwise(0)).cast("bigint").alias(f"__a{i}")
        )
        aggs.append(
            F.sum(F.when(applies & ~holds, 1).otherwise(0))
            .cast("bigint")
            .alias(f"__v{i}")
        )
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("check"),
                F.col(f"__a{i}").alias("n_applicable"),
                F.col(f"__v{i}").alias("n_violations"),
            )
            for i, name in enumerate(rules)
        ]
    )
    return one.select(F.explode(rows).alias("r")).select(
        "r.check", "r.n_applicable", "r.n_violations"
    )
