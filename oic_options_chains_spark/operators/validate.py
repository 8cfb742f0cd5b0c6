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
