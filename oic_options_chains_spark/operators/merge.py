"""Upsert / SCD-0 merge: the reference's weekly-membership
``ON CONFLICT (act_symbol) DO UPDATE`` (reference:
weeklies-transform-load.rkt:52-64; SURVEY.md K3).

Semantics: batch rows fully overwrite matching target rows; target-only
rows are retained; batch-only rows are inserted. Expressed as a full-outer
join + coalesce so it is one shuffle and needs no table format support
(Delta ``MERGE whenMatchedUpdate`` is the storage-level equivalent).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, batch: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Return the merged table state. Non-key columns must match by name."""
    non_keys = [c for c in target.columns if c not in set(keys)]
    assert set(target.columns) == set(batch.columns), "schemas must align"
    t = target.alias("t")
    b = batch.alias("b")
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"b.{k}")) for k in keys]
    joined = t.join(b, on=cond, how="full_outer")
    out = [
        F.coalesce(F.col(f"b.{k}"), F.col(f"t.{k}")).alias(k) for k in keys
    ] + [
        F.when(F.col(f"b.{keys[0]}").isNotNull(), F.col(f"b.{c}"))
        .otherwise(F.col(f"t.{c}"))
        .alias(c)
        for c in non_keys
    ]
    return joined.select(*out)
