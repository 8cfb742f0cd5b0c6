"""Entity resolution: blocked fuzzy matching + golden-record survivorship.

Record linkage is the structured-data sibling of document dedup: the
same entity arrives from multiple feeds with typos, truncations and
missing fields, and the pipeline must (1) find matching record pairs
WITHOUT an all-pairs comparison, (2) group matches into entities, and
(3) emit one canonical ("golden") record per entity with deterministic
survivorship rules. The reference's ingest faces the single-source form
of this (symbol remaps + conflict-ignore PKs, SURVEY.md F9/K1); this
module is the multi-source generalization a training-data warehouse
needs for its metadata tables.

Scale shape:

- **Blocking** bounds the candidate space: records only meet inside a
  (name-prefix, length-band) block, an equi-join key. The length band
  encodes the |len(a) - len(b)| <= 1 filter INTO the key (each record
  lands in bands L and L+1), so the join never sees cross-length pairs
  it would discard — the classic AllPairs length-filter, pushed from
  the predicate into the shuffle key.
- **Matching** runs Levenshtein only inside blocks (candidate-sized,
  not corpus-sized); the verify threshold makes the edge set sparse.
- **Clustering** reuses the large-star/small-star connected components
  (operators/clusters.py) — O(log n) rounds regardless of chain length.
- **Survivorship** is two hash aggregations per entity (majority vote
  with fixed tie-breaks), never a per-entity collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oic_options_chains_spark.operators.clusters import connected_components


def blocked_match_pairs(
    records: DataFrame,
    id_col: str = "rec_id",
    name_col: str = "name",
    prefix_len: int = 4,
    max_edit: int = 1,
) -> DataFrame:
    """Matched record pairs (rec_a < rec_b, edit_dist <= max_edit) via
    (prefix, length-band) blocking. Records whose names differ in their
    first ``prefix_len`` characters or by more than one length unit
    never form a candidate. Returns (rec_a, rec_b, edit_dist)."""
    base = records.select(
        F.col(id_col).alias("__id"),
        F.col(name_col).alias("__nm"),
        F.substring(F.col(name_col), 1, prefix_len).alias("__pfx"),
        F.length(F.col(name_col)).alias("__len"),
    )
    # length bands: a record of length L lands in bands L and L+1, so
    # any pair with |len diff| <= 1 shares exactly one band (and equal
    # lengths share two — dropped by the distinct on verified pairs)
    banded = base.select(
        "__id", "__nm", "__pfx", "__len", F.explode(
            F.array(F.col("__len"), F.col("__len") + 1)
        ).alias("__band")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = a.join(
        b,
        (F.col("a.__pfx") == F.col("b.__pfx"))
        & (F.col("a.__band") == F.col("b.__band"))
        & (F.col("a.__id") < F.col("b.__id")),
    ).select(
        F.col("a.__id").alias("rec_a"),
        F.col("b.__id").alias("rec_b"),
        F.col("a.__nm").alias("__nm_a"),
        F.col("b.__nm").alias("__nm_b"),
    ).distinct()
    dist = F.levenshtein(F.col("__nm_a"), F.col("__nm_b"))
    return cand.select(
        "rec_a", "rec_b", dist.cast("bigint").alias("edit_dist")
    ).filter(F.col("edit_dist") <= max_edit)


def resolve_entities(
    records: DataFrame,
    pairs: DataFrame,
    id_col: str = "rec_id",
) -> DataFrame:
    """(rec_id, entity_id) for EVERY record: matched components labeled
    by their minimum rec_id, singletons by themselves."""
    cc = connected_components(pairs, id_a="rec_a", id_b="rec_b")
    return (
        records.select(F.col(id_col).alias("rec_id"))
        .join(cc.withColumnRenamed("id", "rec_id"), "rec_id", "left")
        .select(
            "rec_id",
            F.coalesce(F.col("cluster_id"), F.col("rec_id")).alias("entity_id"),
        )
    )


def golden_records(
    records: DataFrame,
    assign: DataFrame,
    id_col: str = "rec_id",
    name_col: str = "name",
    cat_col: str = "brand",
    num_col: str = "size",
) -> DataFrame:
    """One canonical record per entity with deterministic survivorship:
    name = the shortest (then lexicographically smallest) variant — the
    un-truncated/un-decorated form wins; categorical = the majority
    non-null value (ties to the lexicographically smallest — a fixed,
    engine-independent vote); numeric = max; plus the record count.
    Ranking the categorical vote needs one (entity, value) aggregate and
    one entity-keyed window over it — entity-sized relations, never the
    record count."""
    joined = records.join(
        assign, records[id_col] == assign["rec_id"], "inner"
    ).select(
        "entity_id",
        F.col(name_col).alias("__nm"),
        F.col(cat_col).alias("__cat"),
        F.col(num_col).alias("__num"),
    )
    base = joined.groupBy("entity_id").agg(
        F.min_by(
            "__nm", F.struct(F.length("__nm").alias("l"), F.col("__nm").alias("n"))
        ).alias("name"),
        F.max("__num").alias(num_col),
        F.count(F.lit(1)).cast("bigint").alias("n_records"),
    )
    votes = (
        joined.filter(F.col("__cat").isNotNull())
        .groupBy("entity_id", "__cat")
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    w = Window.partitionBy("entity_id").orderBy(
        F.col("__n").desc(), F.col("__cat").asc()
    )
    winner = (
        votes.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("entity_id", F.col("__cat").alias(cat_col))
    )
    return base.join(winner, "entity_id", "left").select(
        "entity_id", "name", cat_col, num_col, "n_records"
    )
