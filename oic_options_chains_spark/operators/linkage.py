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


def _segment_geometry(L, i: int, n_seg: int):
    """(start, length) exprs of segment ``i`` when a length-``L`` string
    is evenly split into ``n_seg`` contiguous pieces: the first
    ``n_seg - L % n_seg`` pieces get ``L div n_seg`` chars, the rest one
    more — the PassJoin convention, shared verbatim by the index and
    probe emitters so their keys align."""
    q = F.floor(L / n_seg).cast("int")
    r = L % n_seg
    extra = F.greatest(F.lit(0), F.lit(i) - (F.lit(n_seg) - r))
    start = F.lit(i) * q + extra
    seg_len = q + F.when(F.lit(i) >= (F.lit(n_seg) - r), 1).otherwise(0)
    return start, seg_len


def name_match_edges(
    records: DataFrame,
    name_col: str = "name",
    prefix_len: int = 4,
    max_edit: int = 1,
    blocking: str = "segment",
) -> DataFrame:
    """Matched DISTINCT-NAME pairs (name_a < name_b, edit_dist <=
    max_edit). The relation this self-joins is the name vocabulary —
    record-count independent.

    ``blocking="segment"`` (default) is EXACT for any ``max_edit``: the
    pigeonhole segment scheme of PassJoin (Li/Deng/Feng, ICDE 2011,
    public algorithm). Every name is indexed by its ``max_edit + 1``
    contiguous segments; with at most ``max_edit`` edits between a and
    b, at least one segment of a survives untouched in b, displaced by
    at most ``max_edit`` positions — so b probes, for each candidate
    index length L in ``[len(b)-k, len(b)+k]`` and each segment slot,
    the substrings at starts within ±k of that slot. Index emits k+1
    keys per name, probe O((2k+1)^2 (k+1)) — tiny constants for the
    k<=3 regime — and every candidate is verified with a real
    ``levenshtein``, so recall is exact and precision is exact. Names
    shorter than k+1 chars can't be segmented; they meet in a dedicated
    short block (bounded: the sub-(k+1)-char vocabulary).

    ``blocking="prefix"`` is the cheaper legacy key, (prefix,
    length-band) with bands exploded over ``range(len, len+max_edit+1)``
    so cross-length candidates up to ``max_edit`` meet — but it MISSES
    pairs whose edits fall inside the first ``prefix_len`` chars (a
    known recall tradeoff; use it only when name prefixes are trusted,
    e.g. truncation-only dirt)."""
    names = records.select(F.col(name_col).alias("__nm")).distinct()
    if blocking == "prefix":
        banded = names.select(
            "__nm",
            F.substring(F.col("__nm"), 1, prefix_len).alias("__pfx"),
            F.explode(
                F.array(
                    *[F.length("__nm") + j for j in range(max_edit + 1)]
                )
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
                F.col("a.__nm").alias("name_a"),
                F.col("b.__nm").alias("name_b"),
            )
            .distinct()
        )
    elif blocking == "segment":
        cand = _segment_candidates(names, max_edit)
    else:
        raise ValueError(f"unknown blocking {blocking!r}")
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return cand.select(
        "name_a", "name_b", dist.cast("bigint").alias("edit_dist")
    ).filter(F.col("edit_dist") <= max_edit)


def _segment_candidates(names: DataFrame, k: int) -> DataFrame:
    """Candidate pairs (name_a < name_b) under exact pigeonhole segment
    blocking: equi-join of the index emission (each name's k+1 segments,
    keyed by (own length, slot, segment text)) against the probe
    emission (each name's substrings at the slot geometries of every
    candidate length within ±k, starts within ±k). Both emissions are
    linear in the vocabulary with small constants; the join key carries
    the length band implicitly (probe only enumerates lengths within
    ±k), so no cross-length candidates materialize."""
    n_seg = k + 1
    base = names.select("__nm", F.length("__nm").alias("__l"))

    # ---- index: one row per (name, slot); short names -> slot -1
    idx_parts = []
    long_side = base.filter(F.col("__l") >= n_seg)
    for i in range(n_seg):
        start, seg_len = _segment_geometry(F.col("__l"), i, n_seg)
        idx_parts.append(
            long_side.select(
                F.col("__nm").alias("__inm"),
                F.col("__l").alias("kL"),
                F.lit(i).alias("kslot"),
                F.col("__nm").substr(start + 1, seg_len).alias("kseg"),
            )
        )
    idx_parts.append(
        base.filter(F.col("__l") < n_seg).select(
            F.col("__nm").alias("__inm"),
            F.col("__l").alias("kL"),
            F.lit(-1).alias("kslot"),
            F.lit("").alias("kseg"),
        )
    )
    index = idx_parts[0]
    for part in idx_parts[1:]:
        index = index.unionByName(part)

    # ---- probe: candidate index-lengths L in [len-k, len+k]
    with_L = base.withColumn(
        "kL",
        F.explode(
            F.sequence(
                F.greatest(F.col("__l") - k, F.lit(0)), F.col("__l") + k
            )
        ),
    )
    probe_parts = []
    seg_L = with_L.filter(F.col("kL") >= n_seg)
    for i in range(n_seg):
        p_start, seg_len = _segment_geometry(F.col("kL"), i, n_seg)
        lo = F.greatest(F.lit(0), p_start - k)
        hi = F.least(F.col("__l") - seg_len, p_start + k)
        probe_parts.append(
            seg_L.withColumn(
                "__st",
                F.explode(
                    F.when(hi >= lo, F.sequence(lo, hi)).otherwise(
                        F.array().cast("array<int>")
                    )
                ),
            ).select(
                F.col("__nm").alias("__pnm"),
                "kL",
                F.lit(i).alias("kslot"),
                F.col("__nm").substr(F.col("__st") + 1, seg_len).alias("kseg"),
            )
        )
    probe_parts.append(
        with_L.filter(F.col("kL") < n_seg).select(
            F.col("__nm").alias("__pnm"),
            "kL",
            F.lit(-1).alias("kslot"),
            F.lit("").alias("kseg"),
        )
    )
    probe = probe_parts[0]
    for part in probe_parts[1:]:
        probe = probe.unionByName(part)

    return (
        index.join(
            probe,
            (index["kL"] == probe["kL"])
            & (index["kslot"] == probe["kslot"])
            & (index["kseg"] == probe["kseg"])
            & (index["__inm"] < probe["__pnm"]),
        )
        .select(
            F.col("__inm").alias("name_a"), F.col("__pnm").alias("name_b")
        )
        .distinct()
    )


def resolve_entities(
    records: DataFrame,
    id_col: str = "rec_id",
    name_col: str = "name",
    prefix_len: int = 4,
    max_edit: int = 1,
    blocking: str = "segment",
) -> DataFrame:
    """(rec_id, entity_id) for EVERY record: name-graph components
    expanded back to records, each entity labeled by its minimum
    rec_id; names with no fuzzy neighbor form per-name entities."""
    edges = name_match_edges(records, name_col, prefix_len, max_edit, blocking)
    # name_match_edges closes with __inm < __pnm and a distinct — the
    # components can skip their re-dedup/re-orientation exchanges
    ncc = connected_components(
        edges, id_a="name_a", id_b="name_b", pairs_canonical=True
    )
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
