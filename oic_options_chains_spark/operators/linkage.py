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

Scale shape — the load-bearing decision is WHAT the fuzzy join runs on:

- **Match on DISTINCT NAMES, never on records.** Real catalogs are
  heavy-tailed: one popular name can cover millions of records, and a
  record-level blocked self-join turns that name into a million-squared
  clique (measured: OOM at the 10x scale point in the record-level
  form). Two records with equal names are trivially the same match
  class, so the pairwise Levenshtein work only ever needs the
  vocabulary: distinct names are matched, components are computed on
  the NAME graph, and records join back by name — record count scales
  the cheap map-side steps only.
- **Blocking** bounds the name-pair space: names only meet inside a
  (prefix, length-band) block, an equi-join key. The length band
  encodes |len(a) - len(b)| <= 1 INTO the key (each name lands in
  bands L and L+1), so the join never materializes cross-length
  candidates it would discard — the AllPairs length filter pushed from
  the predicate into the shuffle key.
- **Clustering** reuses the large-star/small-star connected components
  (operators/clusters.py) — O(log n) rounds regardless of chain length
  — over the name graph (vocabulary-sized nodes).
- **Survivorship** is two hash aggregations per entity (majority vote
  with fixed tie-breaks), never a per-entity collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oic_options_chains_spark.operators.clusters import connected_components


def name_match_edges(
    records: DataFrame,
    name_col: str = "name",
    prefix_len: int = 4,
    max_edit: int = 1,
) -> DataFrame:
    """Matched DISTINCT-NAME pairs (name_a < name_b, edit_dist <=
    max_edit) via (prefix, length-band) blocking. The relation this
    self-joins is the name vocabulary — record-count independent."""
    names = records.select(F.col(name_col).alias("__nm")).distinct()
    banded = names.select(
        "__nm",
        F.substring(F.col("__nm"), 1, prefix_len).alias("__pfx"),
        F.explode(
            F.array(F.length("__nm"), F.length("__nm") + 1)
        ).alias("__band"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.__pfx") == F.col("b.__pfx"))
            & (F.col("a.__band") == F.col("b.__band"))
            & (F.col("a.__nm") < F.col("b.__nm")),
        )
        .select(
            F.col("a.__nm").alias("name_a"), F.col("b.__nm").alias("name_b")
        )
        .distinct()
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.select(
        "name_a", "name_b", dist.cast("bigint").alias("edit_dist")
    ).filter(F.col("edit_dist") <= max_edit)


def resolve_entities(
    records: DataFrame,
    id_col: str = "rec_id",
    name_col: str = "name",
    prefix_len: int = 4,
    max_edit: int = 1,
) -> DataFrame:
    """(rec_id, entity_id) for EVERY record: name-graph components
    expanded back to records, each entity labeled by its minimum
    rec_id; names with no fuzzy neighbor form per-name entities."""
    edges = name_match_edges(records, name_col, prefix_len, max_edit)
    ncc = connected_components(edges, id_a="name_a", id_b="name_b")
    rec_names = records.select(
        F.col(id_col).alias("rec_id"), F.col(name_col).alias("__nm")
    )
    labeled = rec_names.join(
        ncc.select(F.col("id").alias("__nm"), F.col("cluster_id").alias("__nc")),
        "__nm",
        "left",
    ).select(
        "rec_id", F.coalesce(F.col("__nc"), F.col("__nm")).alias("__nc")
    )
    entity = labeled.groupBy("__nc").agg(F.min("rec_id").alias("entity_id"))
    return labeled.join(entity, "__nc").select("rec_id", "entity_id")


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
