"""Skew mitigation: explicit key salting.

AQE's skew-join splitting (on in ``session.py``) handles most hot keys at
runtime by splitting oversized shuffle partitions. The explicit form here
is for the cases AQE cannot rewrite — a hot key feeding a window or
aggregation, or a join whose skewed side must stay sort-merge (too big to
broadcast, too hot for one reducer). Salting trades an r-fold replication
of the small side for an n_salts-fold split of the hot key's reducer.

Correctness contract: salting NEVER changes results — ``q_salted_agg``
gates the aggregation pattern against the unsalted oracle, and the tests
gate ``salted_join`` against the plain join row-for-row.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, from_col: str, n_salts: int = 8) -> DataFrame:
    """Deterministic salt in [0, n_salts) derived from an existing
    (unique-ish) column — reproducible under retries, unlike rand()."""
    return df.withColumn(
        "__salt", F.pmod(F.crc32(F.col(from_col).cast("string")), F.lit(n_salts))
    )


def replicate_salts(df: DataFrame, n_salts: int = 8) -> DataFrame:
    """Every row duplicated once per salt value (the small/dim side)."""
    salts = F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(n_salts)]))
    return df.withColumn("__salt", salts)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_salt_from: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``left``'s hot keys are split across ``n_salts``
    reducers and ``right`` is replicated to meet them.

    ``left_salt_from`` names a left column with high cardinality (a row
    id) so the salt spreads evenly within each hot key. Result is
    row-identical to ``left.join(right, on, how)``.
    """
    l_salted = with_salt(left, left_salt_from, n_salts)
    r_salted = replicate_salts(right, n_salts)
    return l_salted.join(r_salted, on=[*on, "__salt"], how=how).drop("__salt")
