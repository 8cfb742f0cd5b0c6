"""Privacy-governance operators: k-anonymity / l-diversity auditing.

A training corpus assembled from user-adjacent sources (support logs,
account exports, crawl segments with profile pages) has to be audited
before release: any combination of quasi-identifiers (QI) that isolates
fewer than ``k`` records re-identifies people, and a QI cell where the
sensitive attribute takes too few distinct values (< ``l``) leaks it even
when the cell is large (homogeneity attack). This module computes both
audits in ONE grouped aggregation over the QI columns, plus the roll-up a
release gate needs (how many cells / records would suppression drop).

Complements ``operators/text.py``'s PII redaction (q_redact): redaction
removes in-band identifiers, this audits the out-of-band ones — the
column combinations that identify without containing a name.

Cross-engine determinism: cell sizes and distinct counts are exact
integers; there is no float anywhere. The risk flag is an integer 0/1 so
the DuckDB oracle matches bit-for-bit.

Scale shape (100 TB): one hash aggregate keyed on the QI columns — the
same shuffle a groupBy count needs, carrying (QI, count, distinct-set)
partials with map-side combine. The distinct-sensitive count uses
count_distinct inside the same aggregate (Spark plans it as a two-phase
expand + aggregate on the identical QI key — still one exchange of the
fact table). The summary roll-up reduces CELLS (bounded by the QI value
cross-product), not records, so it is free at any data scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_cells(
    df: DataFrame,
    qi_cols: Sequence[str],
    sensitive: Column,
    k: int = 5,
    l: int = 2,
) -> DataFrame:
    """Per-QI-cell audit: (qi..., n_rows, l_distinct, k_anonymous,
    l_diverse).

    ``k_anonymous`` = 1 when the cell holds at least ``k`` records;
    ``l_diverse`` = 1 when the sensitive attribute takes at least ``l``
    distinct values in the cell. A release gate suppresses (or
    generalizes the QI of) every cell where either flag is 0.
    """
    return (
        df.groupBy(*qi_cols)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(sensitive).cast("bigint").alias("l_distinct"),
        )
        .select(
            *qi_cols,
            "n_rows",
            "l_distinct",
            (F.col("n_rows") >= k).cast("int").alias("k_anonymous"),
            (F.col("l_distinct") >= l).cast("int").alias("l_diverse"),
        )
    )


def suppression_summary(cells: DataFrame, qi_cols: Sequence[str]) -> DataFrame:
    """Release-gate roll-up over :func:`k_anonymity_cells` output:
    one row — total cells/records, cells/records failing k-anonymity,
    cells failing l-diversity, and the records a suppress-the-failures
    release would keep. Reduces cell counts (QI-domain-bounded), not
    records."""
    risky = F.col("k_anonymous") == 0
    return cells.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("n_rows").cast("bigint").alias("n_records"),
        F.sum(risky.cast("int")).cast("bigint").alias("cells_below_k"),
        F.sum(F.when(risky, F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("records_below_k"),
        F.sum((F.col("l_diverse") == 0).cast("int"))
        .cast("bigint")
        .alias("cells_below_l"),
        F.sum(F.when(~risky & (F.col("l_diverse") == 1), F.col("n_rows")).otherwise(0))
        .cast("bigint")
        .alias("records_releasable"),
    )
