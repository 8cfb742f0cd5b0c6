"""Round-8 t2 queries: data profiling, entity resolution, encoding
audit, JL projection, semantic decontamination and perceptual-hash
image dedup — the metadata/media-side operators a 100 TB training-data
warehouse runs beside the document/embedding pipelines.

Same cross-engine determinism rules as queries/core.py: integer or
fixed-point outputs, md5-only hashing, fixed tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table

_FD_CANDIDATES = [
    ("o_orderkey", "o_custkey"),
    ("o_custkey", "o_orderpriority"),
    ("o_orderdate", "o_orderstatus"),
    ("o_orderpriority", "o_orderstatus"),
]


def _fd_oracle() -> str:
    from oic_options_chains_spark.operators.profiling import fd_profile_oracle_sql

    return fd_profile_oracle_sql("orders", _FD_CANDIDATES)


@register("q_fd_profile", oracle=_fd_oracle())
def q_fd_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiling (operators/profiling.fd_profile):
    exact g3 violation counts for a curated candidate list over orders —
    the key/dependency discovery a lakehouse runs because no engine
    enforces its PKs (the reference's schema.sql:23 did). All candidates
    verified in ONE pass: row-local explode, then three cascading
    map-side-combined aggregations; shuffled volume is the candidates'
    distinct domains, never the row count."""
    from oic_options_chains_spark.operators.profiling import fd_profile

    return fd_profile(load_table(spark, sf_dir, "orders"), _FD_CANDIDATES)


# --- entity resolution -----------------------------------------------------

# two feeds from part: feed b truncates the name's last char for every
# third key and loses brand for every fifth — the classic dirty-merge
_ER_RECORDS_SQL = """
    recs AS MATERIALIZED (
      SELECT p_partkey * 2 AS rec_id, p_name AS name, p_brand AS brand,
             p_size AS size
      FROM part
      UNION ALL
      SELECT p_partkey * 2 + 1,
             CASE WHEN p_partkey % 3 = 0
                  THEN substring(p_name, 1, length(p_name) - 1)
                  ELSE p_name END,
             CASE WHEN p_partkey % 5 = 0 THEN NULL ELSE p_brand END,
             p_size
      FROM part)"""

@register(
    "q_entity_resolution",
    oracle="WITH RECURSIVE "
    + _ER_RECORDS_SQL
    + """,
    names AS MATERIALIZED (SELECT DISTINCT name FROM recs),
    pairs AS MATERIALIZED (
      SELECT a.name AS name_a, b.name AS name_b
      FROM names a
      JOIN names b ON a.name < b.name
                  AND abs(length(a.name) - length(b.name)) <= 1
      WHERE levenshtein(a.name, b.name) <= 1),
    edges AS MATERIALIZED (
      SELECT name_a AS a, name_b AS b FROM pairs
      UNION SELECT name_b, name_a FROM pairs),
    reach(src, dst) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM edges)
      UNION
      SELECT r.src, e.b FROM reach r JOIN edges e ON r.dst = e.a),
    ncc AS MATERIALIZED (
      SELECT src AS name, MIN(dst) AS name_cluster FROM reach GROUP BY src),
    labeled AS MATERIALIZED (
      SELECT r.rec_id, COALESCE(ncc.name_cluster, r.name) AS name_cluster
      FROM recs r LEFT JOIN ncc ON r.name = ncc.name),
    entity AS MATERIALIZED (
      SELECT name_cluster, MIN(rec_id) AS entity_id
      FROM labeled GROUP BY name_cluster),
    assign AS MATERIALIZED (
      SELECT l.rec_id, e.entity_id
      FROM labeled l JOIN entity e ON l.name_cluster = e.name_cluster),
    joined AS MATERIALIZED (
      SELECT a.entity_id, r.name, r.brand, r.size
      FROM recs r JOIN assign a ON r.rec_id = a.rec_id),
    name_pick AS (
      SELECT entity_id, name FROM (
        SELECT entity_id, name,
               row_number() OVER (PARTITION BY entity_id
                                  ORDER BY length(name), name) AS rk
        FROM joined)
      WHERE rk = 1),
    base AS (
      SELECT j.entity_id, ANY_VALUE(np.name) AS name,
             MAX(j.size) AS size,
             CAST(COUNT(*) AS BIGINT) AS n_records
      FROM joined j JOIN name_pick np ON j.entity_id = np.entity_id
      GROUP BY j.entity_id),
    votes AS (
      SELECT entity_id, brand, COUNT(*) AS n FROM joined
      WHERE brand IS NOT NULL GROUP BY entity_id, brand),
    winner AS (
      SELECT entity_id, brand FROM (
        SELECT entity_id, brand,
               row_number() OVER (PARTITION BY entity_id
                                  ORDER BY n DESC, brand ASC) AS rk
        FROM votes)
      WHERE rk = 1)
    SELECT b.entity_id, b.name, w.brand, b.size, b.n_records
    FROM base b LEFT JOIN winner w ON b.entity_id = w.entity_id
    """,
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end entity resolution (operators/linkage.py): two dirty
    feeds of the part catalog (char-truncated names, dropped brands) ->
    pigeonhole-segment blocked Levenshtein matching (EXACT recall for
    edit<=1 — the oracle is brute-force banded levenshtein) over
    DISTINCT NAMES (vocabulary-sized — a record-level blocked self-join
    turns one popular name into a clique and OOMs at the 10x scale
    point) -> large-star/small-star components on the name graph,
    expanded back to records -> one golden record per entity with
    deterministic survivorship (shortest name, majority non-null brand
    with lexicographic tie, max size). The blocking carries the length
    band inside the equi-join key (probe only enumerates lengths within
    +-max_edit), so the match join never materializes cross-length
    candidates."""
    from oic_options_chains_spark.operators.linkage import (
        golden_records,
        resolve_entities,
    )

    p = load_table(spark, sf_dir, "part")
    feed_a = p.select(
        (F.col("p_partkey") * 2).alias("rec_id"),
        F.col("p_name").alias("name"),
        F.col("p_brand").alias("brand"),
        F.col("p_size").alias("size"),
    )
    feed_b = p.select(
        (F.col("p_partkey") * 2 + 1).alias("rec_id"),
        F.when(
            F.col("p_partkey") % 3 == 0,
            F.substring(F.col("p_name"), 1, F.length("p_name") - 1),
        )
        .otherwise(F.col("p_name"))
        .alias("name"),
        F.when(F.col("p_partkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("p_brand"))
        .alias("brand"),
        F.col("p_size").alias("size"),
    )
    records = feed_a.unionByName(feed_b).localCheckpoint(eager=True)
    assign = resolve_entities(records, max_edit=1)
    return golden_records(records, assign)


@register(
    "q_encoding_audit",
    oracle=r"""
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(octet_length(encode(text)) - length(text) AS BIGINT)
             AS non_ascii_bytes,
           CAST(length(text) - length(regexp_replace(text,
                '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g')) AS BIGINT)
             AS n_control,
           CAST(length(text) - length(replace(text, '�', ''))
             AS BIGINT) AS n_replacement,
           CAST(length(regexp_extract_all(text, '(â€.|Ã.|Â )')) AS BIGINT)
             AS n_mojibake,
           CAST(CASE WHEN length(text) > 0 THEN
                FLOOR(10000.0 * (length(text) - length(regexp_replace(text,
                      '[ \t\n\r]', '', 'g'))) / length(text))
                ELSE 0 END AS BIGINT) AS ws_bp
    FROM documents
    """,
)
def q_encoding_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document encoding health (operators/text.encoding_metrics):
    UTF-8 byte overhead, control chars, U+FFFD replacement chars,
    CP1252-mojibake fingerprints, whitespace share — the
    route/quarantine decision a crawl ingest makes before any model
    sees a document. Row-local column expressions; zero exchanges."""
    from oic_options_chains_spark.operators.text import encoding_metrics

    d = load_table(spark, sf_dir, "documents")
    m = encoding_metrics(F.col("text"))
    return d.select(
        "doc_id",
        m["n_chars"].alias("n_chars"),
        m["n_bytes"].alias("n_bytes"),
        m["non_ascii_bytes"].alias("non_ascii_bytes"),
        m["n_control"].alias("n_control"),
        m["n_replacement"].alias("n_replacement"),
        m["n_mojibake"].alias("n_mojibake"),
        m["ws_bp"].alias("ws_bp"),
    )


_JL_DIM = 16

_JL_SQL = f"""
    q AS (
      SELECT vec_id,
             list_transform(embedding,
                            x -> CAST(FLOOR(CAST(x AS DOUBLE) * 4096)
                                      AS BIGINT)) AS qa
      FROM embeddings),
    proj AS (
      SELECT vec_id, qa, k,
             list_reduce(
               list_transform(
                 list_zip(qa, range(1, len(qa) + 1)),
                 p -> p[1] * (CASE WHEN CAST('0x' ||
                        substring(md5(CAST(p[2] - 1 AS VARCHAR) || ':' ||
                                      CAST(k AS VARCHAR)), 1, 8)
                        AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END)),
               (acc, x) -> acc + x) AS pv
      FROM q CROSS JOIN (SELECT unnest(range(0, {_JL_DIM})) AS k)),
    agg AS (
      SELECT vec_id,
             CAST((10000 * CAST(SUM(pv * pv) AS BIGINT)) //
                  ({_JL_DIM} * ANY_VALUE(list_reduce(
                     list_transform(qa, x -> x * x),
                     (acc, x) -> acc + x))) AS BIGINT) AS norm_ratio_bp
      FROM proj GROUP BY vec_id)
"""


@register(
    "q_random_projection",
    oracle="WITH "
    + _JL_SQL
    + """
    SELECT p.vec_id, CAST(p.k AS INT) AS k, CAST(p.pv AS BIGINT) AS proj,
           a.norm_ratio_bp
    FROM proj p JOIN agg a ON p.vec_id = a.vec_id
    """,
)
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss sign projection
    (operators/projection.jl_project): 64 -> 16 dims, the matrix
    regenerated from md5 parity (nothing broadcast, nothing versioned),
    with the per-vector norm-preservation ratio as the quality gate.
    Entirely row-local — the projected corpus never shuffles."""
    from oic_options_chains_spark.operators.projection import jl_project

    emb = load_table(spark, sf_dir, "embeddings")
    out = jl_project(emb, out_dim=_JL_DIM, in_dim=64)
    # posexplode_OUTER: a non-outer Generate makes the optimizer infer
    # size(proj) > 0 and push the entire 16x64 projection expression onto
    # the scan as a per-row predicate (13k-char fused Filter caught by
    # tools/plan_audit.py). proj is never null/empty (jl_project raises
    # on width mismatch), so the outer form plus the generated-attribute
    # guard is value-identical with the projection evaluated once.
    return out.select(
        "vec_id",
        F.posexplode_outer("proj").alias("k", "proj"),
        "norm_ratio_bp",
    ).filter(F.col("proj").isNotNull()).select(
        "vec_id", F.col("k").cast("int").alias("k"), "proj", "norm_ratio_bp"
    )


@register(
    "q_semantic_decontam",
    oracle="""
    WITH b AS (
      SELECT vec_id, embedding,
             (CASE WHEN embedding[1] > 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[2] > 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[3] > 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[4] > 0 THEN '1' ELSE '0' END) AS bucket
      FROM embeddings),
    ev AS (SELECT * FROM b WHERE vec_id % 10 = 0),
    tr AS (SELECT * FROM b WHERE vec_id % 10 <> 0),
    p AS (
      SELECT a.vec_id AS train_id, c.vec_id AS eval_id,
        list_reduce(list_transform(list_zip(a.embedding, c.embedding),
                                   p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)),
                    (acc, x) -> acc + x)
        / (sqrt(list_reduce(list_transform(a.embedding,
                                           x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                            (acc, x) -> acc + x))
           * sqrt(list_reduce(list_transform(c.embedding,
                                             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                              (acc, x) -> acc + x))) AS cos
      FROM tr a JOIN ev c ON a.bucket = c.bucket),
    hits AS (SELECT train_id, eval_id,
                    CAST(FLOOR(1e6 * cos) AS BIGINT) AS score_e6
             FROM p WHERE cos >= 0.35)
    SELECT train_id AS vec_id, eval_id AS contaminant_id, score_e6
    FROM (SELECT *, row_number() OVER (PARTITION BY train_id
                 ORDER BY score_e6 DESC, eval_id ASC) AS rk FROM hits)
    WHERE rk = 1
    """,
)
def q_semantic_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination (operators/similarity.cross_near_pairs):
    flag training vectors whose cosine against ANY held-out/benchmark
    vector clears the near-dup threshold — the embedding-space
    complement of the n-gram q_decontaminate. Bipartite bucket join:
    the 100 TB train side never self-pairs; candidates are bounded by
    the (small) eval side's bucket occupancy. Output: each contaminated
    train vector with its strongest eval match.

    DIAGNOSTIC TWIN since round 12: the single 4-bit sign bucket
    measures only ~15% pair recall at this threshold (AND over all
    bits) — kept registered so the decay stays on the curve next to
    the fix. Production decontamination is q_decontam_banded /
    q_decontam_fixed_eval (banded LSH, >= 9000 bp recall contract at
    cos >= 0.7; see SCALING.md round-12)."""
    from oic_options_chains_spark.operators.similarity import cross_near_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 10 == 0)
    tr = emb.filter(F.col("vec_id") % 10 != 0)
    hits = cross_near_pairs(tr, ev, threshold=0.35, bits=4)
    w = Window.partitionBy("id_a").orderBy(
        F.col("score_e6").desc(), F.col("id_b").asc()
    )
    return (
        hits.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("id_a").alias("vec_id"),
            F.col("id_b").alias("contaminant_id"),
            "score_e6",
        )
    )


# --- q_decontam_banded (registered round 12) -------------------------------
# Built and cross-engine-tested in round 11 (tests/test_round11_banded_oracle
# .py) while the registry was held at 219 per VERDICT r10 item 1; the
# @register flip landed in round 12.

DECONTAM_BANDED_ORACLE = """
    WITH planes AS (
      SELECT i, k,
             CASE WHEN CAST(concat('0x', substr(md5('hp:' || i || ':' || k),
                                   1, 8)) AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS s
      FROM range(0, 64) t1(i) CROSS JOIN range(0, 224) t2(k)),
    qv AS (
      SELECT vec_id, embedding,
             list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 4096) AS BIGINT)) AS q
      FROM embeddings),
    qe AS (SELECT vec_id, unnest(range(0, len(q))) AS i, unnest(q) AS qi
           FROM qv),
    dots AS (SELECT qe.vec_id, p.k, SUM(qe.qi * p.s) AS d
             FROM qe JOIN planes p ON qe.i = p.i GROUP BY 1, 2),
    keys AS (
      SELECT vec_id, CAST(k // 8 AS INT) AS t,
             CAST(SUM(CASE WHEN d >= 0 THEN 1 << CAST(k % 8 AS INT)
                           ELSE 0 END) AS BIGINT) AS key
      FROM dots GROUP BY 1, 2),
    cand AS (
      SELECT DISTINCT a.vec_id AS train_id, c.vec_id AS eval_id
      FROM keys a JOIN keys c ON a.t = c.t AND a.key = c.key
      WHERE a.vec_id % 10 <> 0 AND c.vec_id % 10 = 0),
    p AS (
      SELECT cand.train_id, cand.eval_id,
        list_reduce(list_transform(list_zip(a.embedding, c.embedding),
                                   pr -> CAST(pr[1] AS DOUBLE)
                                         * CAST(pr[2] AS DOUBLE)),
                    (acc, x) -> acc + x)
        / (sqrt(list_reduce(list_transform(a.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                            (acc, x) -> acc + x))
           * sqrt(list_reduce(list_transform(c.embedding,
                                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                              (acc, x) -> acc + x))) AS cos
      FROM cand JOIN qv a ON cand.train_id = a.vec_id
                JOIN qv c ON cand.eval_id = c.vec_id),
    hits AS (SELECT train_id, eval_id,
                    CAST(FLOOR(1e6 * cos) AS BIGINT) AS score_e6
             FROM p WHERE cos >= 0.35)
    SELECT train_id AS vec_id, eval_id AS contaminant_id, score_e6
    FROM (SELECT *, row_number() OVER (PARTITION BY train_id
                 ORDER BY score_e6 DESC, eval_id ASC) AS rk FROM hits)
    WHERE rk = 1
"""


def _banded_decontam_top1(
    spark: SparkSession,
    sf_dir: str,
    threshold: float,
    contract_cos: float | None = None,
    eval_cap: int | None = None,
) -> DataFrame:
    """The shared banded-decontamination reporting shape (round-14
    dedup of the three contract keys + fixed-eval): eval = vec_id%10==0
    (optionally capped to the fixed suite, ``eval_cap``), train = the
    rest, cross_near_pairs_banded at ``threshold`` (solver-default L
    unless ``contract_cos`` restates the contract), top-1 contaminant
    per flagged train vector (score desc, id asc). One definition so a
    reporting change — e.g. the tie-break — cannot drift between the
    contract points."""
    from oic_options_chains_spark.operators.similarity import (
        cross_near_pairs_banded,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 10 == 0)
    if eval_cap is not None:
        ev = ev.filter(F.col("vec_id") < eval_cap)
    tr = emb.filter(F.col("vec_id") % 10 != 0)
    kwargs = {} if contract_cos is None else {"contract_cos": contract_cos}
    hits = cross_near_pairs_banded(tr, ev, threshold=threshold, **kwargs)
    w = Window.partitionBy("id_a").orderBy(
        F.col("score_e6").desc(), F.col("id_b").asc()
    )
    return (
        hits.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("id_a").alias("vec_id"),
            F.col("id_b").alias("contaminant_id"),
            "score_e6",
        )
    )


@register("q_decontam_banded", oracle=DECONTAM_BANDED_ORACLE)
def q_decontam_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH semantic decontamination
    (operators/similarity.cross_near_pairs_banded, L=28 x b=8 — the
    round-12 recall-contract parameterization: >= 9000 bp planted-pair
    recall at the promised cos >= 0.7 near-dup threshold): the
    recall-preserving scale form of q_semantic_decontam — OR-amplified
    hyperplane tables instead of one AND-over-all-bits sign bucket,
    exact cosine verify, top-1 eval contaminant per flagged train
    vector. The md5-parity plane matrix regenerates from its formula in
    any engine, so the oracle replays the keys bit-for-bit (the oracle
    uses DISTINCT candidates where Spark uses first-matching-table
    emit-once — same pair set either way)."""
    return _banded_decontam_top1(spark, sf_dir, threshold=0.35)


# the deployment shape of the banded screen: eval/benchmark suites do
# NOT grow with the crawl, so the reference side is a FIXED id range
# (vec_id < 2000) while the probe side scales. q_decontam_banded keeps
# the synthetic both-sides-scale shape (its curve slope reflects a
# growing eval side BY DESIGN — documented so the curve isn't misread);
# this key contracts the broadcast-fixed-reference form whose cost is
# linear in the probe corpus.
DECONTAM_FIXED_EVAL_ORACLE = DECONTAM_BANDED_ORACLE.replace(
    "AND c.vec_id % 10 = 0", "AND c.vec_id % 10 = 0 AND c.vec_id < 2000"
)
assert DECONTAM_FIXED_EVAL_ORACLE != DECONTAM_BANDED_ORACLE


@register("q_decontam_fixed_eval", oracle=DECONTAM_FIXED_EVAL_ORACLE)
def q_decontam_fixed_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH decontamination in the REAL-DEPLOYMENT shape: the
    eval/reference side is a fixed population (vec_id < 2000 — the
    sf0.1-sized eval suite at every scale) broadcast against a probe
    corpus that alone grows. Same recall-contract operator defaults as
    q_decontam_banded (L=28 x b=8, >= 9000 bp planted recall at
    cos >= 0.7); the cost shape is the difference — linear in the probe
    corpus because the broadcast reference never shuffles it
    (SCALE_CURVE q_semantic_decontam@fixed_eval measured ~flat while
    the both-sides twin grows)."""
    return _banded_decontam_top1(spark, sf_dir, threshold=0.35, eval_cap=2000)


# the contract-parameterized banded screen at a NON-default near-dup
# threshold (round 13, VERDICT r12 item 5): contract_cos=0.8 makes
# cross_near_pairs_banded SOLVE its table count via tables_for
# (L = tables_for(0.8, 9250, dispersion=True) = 17 at b=8 — the
# round-14 dispersion-corrected solve; same 17 the r13 closed-form
# +400 bp margin produced) instead of inheriting the 0.7-contract's 28
# — the oracle replays the same md5-parity plane family over exactly
# 17*8 = 136 planes, so a drift between the solver and the served key
# count breaks the value hash. Emission threshold 0.5 (a 0.8-contract
# screen still reports the borderline pairs it happens to catch; the
# PROMISE only covers cos >= 0.8).
DECONTAM_T08_ORACLE = DECONTAM_BANDED_ORACLE.replace(
    "range(0, 224)", "range(0, 136)"
).replace("cos >= 0.35", "cos >= 0.5")
assert "range(0, 136)" in DECONTAM_T08_ORACLE
assert "cos >= 0.5" in DECONTAM_T08_ORACLE


@register("q_decontam_t08", oracle=DECONTAM_T08_ORACLE)
def q_decontam_t08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH decontamination with the recall contract RESTATED at
    cos >= 0.8 (operators/similarity.cross_near_pairs_banded with
    contract_cos=0.8): the threshold->tables_for default path solves
    the minimal margin-bearing table count for the promise — L=17 x b=8
    here, vs the 0.7 contract's 28 — so a deployment screening only for
    tighter near-dups pays 17/28 of the key-generation and bucket-probe
    cost and keeps the same >= 9000 bp planted-pair floor (conservative
    solve curve at the 0.8 boundary: 9281 bp via banded_recall_bp;
    closed-form mean 9482 — see the SCALING.md round-14 addendum;
    measured row in SCALE_CURVE recall_bp:planted_c80).
    Same top-1-contaminant reporting shape as q_decontam_banded."""
    return _banded_decontam_top1(
        spark, sf_dir, threshold=0.5, contract_cos=0.8
    )


# the contract restated LOOSER than the default (round 14): a 0.6
# near-dup boundary needs MORE tables (the S-curve is flatter there) —
# the dispersed solve resolves L = tables_for(0.6, 9250,
# dispersion=True) = 45 at b=8, so the oracle replays 45*8 = 360
# planes. Together with 0.7->28 and 0.8->17 this pins the solver at
# three contract points spanning both directions from the default, and
# carries its own planted-probe row (SCALE_CURVE
# recall_bp:planted_c60 — conservative solve curve 9288 bp,
# closed-form mean 9409).
DECONTAM_T06_ORACLE = DECONTAM_BANDED_ORACLE.replace(
    "range(0, 224)", "range(0, 360)"
)
assert "range(0, 360)" in DECONTAM_T06_ORACLE


@register("q_decontam_t06", oracle=DECONTAM_T06_ORACLE)
def q_decontam_t06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH decontamination with the recall contract RESTATED at
    cos >= 0.6 (operators/similarity.cross_near_pairs_banded with
    contract_cos=0.6): the dispersion-corrected tables_for default path
    (round 14) solves L=45 x b=8 — a looser near-dup boundary sits on a
    flatter part of the recall S-curve, so the same >= 9000 bp
    planted-pair promise costs 45/28 of the 0.7 contract's tables.
    Emission threshold stays the operator's 0.35 default (the screen
    reports what it catches; the PROMISE covers cos >= 0.6). Same
    top-1-contaminant reporting shape as q_decontam_banded."""
    return _banded_decontam_top1(
        spark, sf_dir, threshold=0.35, contract_cos=0.6
    )


# the deployment-shaped twin of the 0.6 contract (round 15, VERDICT r14
# item 2): q_decontam_t06 deliberately keeps the both-sides-scale probe
# shape (its superlinear sf1->sf2 curve tail is by construction — the
# 0.35 emission threshold x L=45 admits ~60% of all cos>=0.35 pairs
# into exact verify, and borderline pair mass grows quadratically when
# BOTH sides grow; ledgered in SCALING.md r14). This key is the same
# L=45 solver contract in the shape a deployment actually runs: a fixed
# broadcast eval suite (vec_id < 2000 at every scale) against a probe
# corpus that alone grows — linear cost, mirroring
# q_decontam_fixed_eval's relationship to q_decontam_banded.
DECONTAM_T06_FIXED_ORACLE = DECONTAM_T06_ORACLE.replace(
    "AND c.vec_id % 10 = 0", "AND c.vec_id % 10 = 0 AND c.vec_id < 2000"
)
assert DECONTAM_T06_FIXED_ORACLE != DECONTAM_T06_ORACLE
assert "range(0, 360)" in DECONTAM_T06_FIXED_ORACLE


@register("q_decontam_t06_fixed", oracle=DECONTAM_T06_FIXED_ORACLE)
def q_decontam_t06_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH decontamination at the cos >= 0.6 recall contract
    (contract_cos=0.6 -> tables_for solves L=45 x b=8, as
    q_decontam_t06) in the REAL-DEPLOYMENT cost shape: the
    eval/reference side is a fixed population (vec_id < 2000) broadcast
    against the probe corpus, so cost is linear in the crawl while the
    promise (>= 9000 bp planted recall at cos >= 0.6) is unchanged.
    The both-sides-scale twin q_decontam_t06 stays as the solver-pin
    probe key; THIS is the shape to deploy at 100 TB. Same
    top-1-contaminant reporting as q_decontam_banded."""
    return _banded_decontam_top1(
        spark, sf_dir, threshold=0.35, contract_cos=0.6, eval_cap=2000
    )


# shared aHash CTE core (px -> block sums -> 4x16-bit bands -> flat band
# keys) over a `feeds(doc_id, text)` CTE the caller prepends
_AHASH_CORE = """
    px AS MATERIALIZED (
      SELECT doc_id,
             list_transform(
               string_split(substring(repeat(text || ' ',
                 CAST(1024 // (length(text) + 1) + 1 AS INT)), 1, 1024), ''),
               c -> CAST(ord(c) AS BIGINT)) AS p
      FROM feeds),
    blocks AS MATERIALIZED (
      SELECT doc_id,
             list_transform(range(0, 64), b ->
               list_reduce(
                 list_transform(range(0, 16), j ->
                   p[CAST((b // 8) * 128 + (j // 4) * 32
                          + (b % 8) * 4 + (j % 4) + 1 AS INT)]),
                 (acc, x) -> acc + x)) AS bs
      FROM px),
    bands AS MATERIALIZED (
      SELECT doc_id,
             list_transform(range(0, 4), t ->
               list_reduce(
                 list_transform(range(0, 16), u ->
                   CASE WHEN 64 * bs[CAST(t * 16 + u + 1 AS INT)] >=
                        list_reduce(bs, (acc, x) -> acc + x)
                        THEN CAST(2 ** u AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END),
                 (acc, x) -> acc + x)) AS bv
      FROM blocks),
    flat AS MATERIALIZED (
      SELECT doc_id, CAST(t AS INT) - 1 AS band_idx,
             CAST(bv[CAST(t AS INT)] AS BIGINT) AS band_val, bv
      FROM bands CROSS JOIN (SELECT unnest(range(1, 5)) AS t))
"""

# exact Hamming from two 4x16-bit band arrays (arithmetic bit extract)
_HAMMING_SQL = """
             CAST(list_reduce(list_transform(range(0, 64), u ->
               CASE WHEN (ba[CAST(u // 16 + 1 AS INT)]
                          // CAST(2 ** (u % 16) AS BIGINT)) % 2 <>
                         (bb[CAST(u // 16 + 1 AS INT)]
                          // CAST(2 ** (u % 16) AS BIGINT)) % 2
                    THEN 1 ELSE 0 END),
               (acc, x) -> acc + x) AS BIGINT)"""


@register(
    "q_ahash_dedup",
    oracle="""WITH
    feeds AS (
      SELECT doc_id * 2 AS doc_id, text FROM documents
      UNION ALL
      SELECT doc_id * 2 + 1, upper(text) FROM documents),"""
    + _AHASH_CORE
    + """
    , cand AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             a.bv AS ba, b.bv AS bb
      FROM flat a
      JOIN flat b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                 AND a.doc_id < b.doc_id),
    ham AS (
      SELECT doc_a, doc_b,"""
    + _HAMMING_SQL
    + """ AS hamming
      FROM cand)
    SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 3
    """,
)
def q_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash near-dup image pairs
    (operators/phash.ahash_pairs): 64-bit block-mean hash over a 32x32
    code-point raster (document text stands in for decoded grayscale,
    the q_binary_meta convention; the REAL decoded-pixel path is
    operators/phash.ahash64 + image_ahash_kernel over the in-tree PNG
    codec, golden-tested). The corpus is two feeds — each document and
    its case-folded variant, a uniform "brightness shift" that moves
    most pixels by the same amount — and the hash finds the sibling
    pairs BECAUSE block-mean-vs-global-mean bits are shift-invariant,
    the property that makes aHash survive re-encodes. Banded exact
    search: Hamming <= 3 pairs must share one of 4 16-bit bands
    (pigeonhole), so candidates come from one band-keyed equi-join —
    the SimHash plan shape with pixel-mean bits."""
    from oic_options_chains_spark.operators.phash import ahash_pairs

    d = load_table(spark, sf_dir, "documents")
    feeds = d.select(
        (F.col("doc_id") * 2).alias("doc_id"), F.col("text")
    ).unionByName(
        d.select((F.col("doc_id") * 2 + 1).alias("doc_id"), F.upper("text").alias("text"))
    )
    return ahash_pairs(feeds, max_hamming=3)


def _ahash_epoch_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MATERIALIZED once-per-epoch aHash index of the documents
    corpus (operators/phash.materialize_epoch_index), served through
    the shared build-once cache (sources/epoch.epoch_parquet — keyed by
    source identity, atomic-rename build, benign concurrent race): the
    serving shape VERDICT r12 item 2 asked for, where the incremental
    screen's steady-state cost is delta-side work only. Index contents
    are a pure function of the corpus (the DuckDB oracle recomputes
    them from raw text and still matches), so the cache can only ever
    change WHEN work happens, not WHAT the query returns."""
    import os

    from oic_options_chains_spark.operators.phash import (
        materialize_epoch_index,
    )
    from oic_options_chains_spark.sources.epoch import epoch_parquet

    return epoch_parquet(
        spark,
        os.path.join(sf_dir, "documents.parquet"),
        "ahash-epoch-v1",
        lambda tmp: materialize_epoch_index(
            load_table(spark, sf_dir, "documents").select("doc_id", "text"),
            tmp,
        ),
    )


@register(
    "q_ahash_incremental",
    oracle="""WITH
    feeds AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, upper(text) FROM documents
      WHERE doc_id % 5 = 0),"""
    + _AHASH_CORE
    + """
    , base_f AS (SELECT * FROM flat WHERE doc_id < 1000000),
    delta_f AS (SELECT * FROM flat WHERE doc_id >= 1000000),
    cand AS MATERIALIZED (
      SELECT DISTINCT d.doc_id AS delta_id, b.doc_id AS base_id,
             d.bv AS ba, b.bv AS bb
      FROM delta_f d
      JOIN base_f b ON d.band_idx = b.band_idx AND d.band_val = b.band_val),
    scored AS (
      SELECT delta_id, base_id,"""
    + _HAMMING_SQL
    + """ AS hamming
      FROM cand),
    best AS (
      SELECT delta_id, base_id, hamming FROM (
        SELECT *, row_number() OVER (PARTITION BY delta_id
                  ORDER BY hamming ASC, base_id ASC) AS rk
        FROM scored WHERE hamming <= 3)
      WHERE rk = 1)
    SELECT dd.doc_id,
           CAST(CASE WHEN best.base_id IS NULL THEN 1 ELSE 0 END AS INT)
             AS kept,
           CAST(best.base_id AS BIGINT) AS dup_of,
           CAST(best.hamming AS BIGINT) AS hamming
    FROM (SELECT doc_id + 1000000 AS doc_id FROM documents
          WHERE doc_id % 5 = 0) dd
    LEFT JOIN best ON dd.doc_id = best.delta_id
    """,
)
def q_ahash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental media dedup (operators/phash.ahash_incremental): a
    delta batch of "re-uploaded" images (every fifth document,
    case-folded — the brightness-shifted re-encode) screened against
    the base corpus's aHash band index. The base NEVER self-pairs AND
    never re-hashes (round 13): the query consumes the materialized
    epoch index (:func:`_ahash_epoch_index` — built once per corpus
    identity, read back as a plain parquet scan), so per batch the work
    is the delta's own hashing plus a bucket join against the index —
    the only dedup shape that holds up when the base is 100 TB and the
    delta is a day's crawl. One row per delta image: kept / dup_of /
    hamming."""
    from oic_options_chains_spark.operators.phash import ahash_incremental

    d = load_table(spark, sf_dir, "documents")
    delta = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.upper("text").alias("text"),
    )
    return ahash_incremental(
        None,
        delta,
        max_hamming=3,
        base_index=_ahash_epoch_index(spark, sf_dir),
    )


# real-pixel media pipeline: the pixel lambda regenerates the kernel's
# raster (30 + codepoint%180, sibling +20) — encode_png/decode_png is
# lossless, so the SQL replay of the raster math equals the hash of the
# DECODED bytes; any codec or kernel corruption breaks the value hash
_MEDIA_CORE = """
    okf AS MATERIALIZED (SELECT * FROM feeds WHERE img_id % 97 <> 0),
    px AS MATERIALIZED (
      SELECT img_id,
             list_transform(
               string_split(substring(repeat(text || ' ',
                 CAST(1024 // (length(text) + 1) + 1 AS INT)), 1, 1024), ''),
               c -> CAST(30 + (ord(c) % 180) + shift AS BIGINT)) AS p
      FROM okf),
    blocks AS MATERIALIZED (
      SELECT img_id,
             list_transform(range(0, 64), b ->
               list_reduce(
                 list_transform(range(0, 16), j ->
                   p[CAST((b // 8) * 128 + (j // 4) * 32
                          + (b % 8) * 4 + (j % 4) + 1 AS INT)]),
                 (acc, x) -> acc + x)) AS bs
      FROM px),
    bands AS MATERIALIZED (
      SELECT img_id,
             list_transform(range(0, 4), t ->
               list_reduce(
                 list_transform(range(0, 16), u ->
                   CASE WHEN 64 * bs[CAST(t * 16 + u + 1 AS INT)] >=
                        list_reduce(bs, (acc, x) -> acc + x)
                        THEN CAST(2 ** u AS BIGINT)
                        ELSE CAST(0 AS BIGINT) END),
                 (acc, x) -> acc + x)) AS bv
      FROM blocks),
    flat AS MATERIALIZED (
      SELECT img_id, CAST(t AS INT) - 1 AS band_idx,
             CAST(bv[CAST(t AS INT)] AS BIGINT) AS band_val, bv
      FROM bands CROSS JOIN (SELECT unnest(range(1, 5)) AS t))
"""


@register(
    "q_media_pipeline",
    oracle="""WITH
    feeds AS (
      SELECT doc_id * 2 AS img_id, text, 0 AS shift FROM documents
      UNION ALL
      SELECT doc_id * 2 + 1, text, 20 FROM documents),"""
    + _MEDIA_CORE
    + """
    , cand AS MATERIALIZED (
      SELECT DISTINCT a.img_id AS doc_a, b.img_id AS doc_b,
             a.bv AS ba, b.bv AS bb
      FROM flat a
      JOIN flat b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                 AND a.img_id < b.img_id),
    pairs AS (
      SELECT doc_a, doc_b, hamming FROM (
        SELECT doc_a, doc_b,"""
    + _HAMMING_SQL
    + """ AS hamming
        FROM cand)
      WHERE hamming <= 3),
    best AS (
      SELECT doc_b AS img_id, doc_a AS dup_of, hamming FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_b
                  ORDER BY hamming ASC, doc_a ASC) AS rk
        FROM pairs)
      WHERE rk = 1)
    SELECT f.img_id,
           CAST(CASE WHEN f.img_id % 97 = 0 THEN 0 ELSE 1 END AS INT) AS ok,
           CAST(CASE WHEN f.img_id % 97 <> 0 AND best.dup_of IS NULL
                THEN 1 ELSE 0 END AS INT) AS kept,
           CAST(best.dup_of AS BIGINT) AS dup_of,
           CAST(best.hamming AS BIGINT) AS hamming,
           CASE WHEN f.img_id % 97 = 0 THEN 'ValueError' ELSE NULL END AS err
    FROM feeds f LEFT JOIN best ON f.img_id = best.img_id
    """,
)
def q_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-media end-to-end flagship (operators/phash.media_near_dup):
    per document two genuine 32x32 grayscale PNGs (the sibling
    brightness-shifted by +20 — the clip-free re-encode aHash is built
    to survive) are encoded, pushed through the in-tree CRC-verifying
    PNG decoder, and aHashed — all inside ONE mapInPandas stage whose
    output is the index-sized (id, 4-band) relation, so the media bytes
    never cross an exchange. Every 97th blob ships truncated and must
    QUARANTINE through the codec's own validation (ok=0, err set).
    Downstream is pure JVM: banded candidate equi-join (pigeonhole
    Hamming<=3), arithmetic Hamming verify, first-arrival keeper
    verdicts. The oracle replays the raster math in SQL — legal exactly
    because encode->decode is lossless and the kernel's pooling is the
    band table's integer math, so a single corrupted pixel anywhere in
    the codec/kernel path breaks the value hash."""
    from oic_options_chains_spark.operators.phash import media_near_dup

    d = load_table(spark, sf_dir, "documents")
    return media_near_dup(d, id_col="doc_id", text_col="text", max_hamming=3)
