"""BM25-family term weighting over a corpus — the relevance/importance
scores a retrieval-augmented training pipeline attaches to (doc, term)
pairs.

Decomposition (all relational, shuffle-minimal):

  1. term frequencies: explode + one groupBy (doc_id, term)   [1 shuffle]
  2. document frequencies: groupBy term over the same rows    [1 shuffle]
  3. doc length + corpus avgdl: agg over tf rows; avgdl is a scalar,
     joined by broadcast (a literal-sized side)
  4. score: pure column arithmetic

At scale the (doc, term) tf table is the big intermediate; both
aggregations are partial+final hash aggregates with map-side combine, and
the df table (vocabulary-sized, millions not billions) broadcasts back
onto the tf rows, so the corpus body shuffles exactly twice.

Cross-engine determinism: no logarithms. libm's ln differs by last-ulp
across implementations, which breaks value-hash comparison, so the
classic idf = ln((N-df+0.5)/(df+0.5)+1) is split: we emit the RATIONAL
inside ((N-df+0.5)/(df+0.5)) floor-scaled, plus the saturated-tf factor
tf*(k1+1)/(tf+k1*(1-b+b*dl/avgdl)). Both use only IEEE +,-,*,/ which are
correctly rounded and therefore bit-identical on any engine; a consumer
that wants the log applies it engine-locally (it is monotone, so ranking
order is already fully determined by what we emit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

K1 = 1.2
B = 0.75


def term_frequencies(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, term, tf) with whitespace tokenization (matches
    operators/text.tokens)."""
    tok = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    )
    return tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))


def bm25_components(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per (doc, term): tf, df, saturated-tf and idf-rational scores.

    Output columns: id_col, term, tf, doc_freq, dl, tf_sat_e6,
    idf_rational_e6 — the two *_e6 columns are the BM25 factors
    floor-scaled to micro-units (engine-portable integers).
    """
    tf = term_frequencies(df, text_col=text_col, id_col=id_col)
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    # avgdl AND the corpus size come from the same one-row aggregate —
    # no eager df.count() (that would be a full extra corpus scan at
    # plan-construction time). Every document has >= 1 token (split of
    # "" is [""]), so count(dl) == count(corpus).
    avgdl_row = dl.agg(
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avgdl"
        ),
        F.count(F.lit(1)).cast("double").alias("n_docs"),
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))

    scored = (
        tf.join(F.broadcast(docfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(avgdl_row))
    )
    tfd = F.col("tf").cast("double")
    dld = F.col("dl").cast("double")
    tf_sat = (tfd * F.lit(K1 + 1.0)) / (
        tfd + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dld / F.col("avgdl"))
    )
    n = F.col("n_docs")
    dfd = F.col("doc_freq").cast("double")
    idf_rational = (n - dfd + F.lit(0.5)) / (dfd + F.lit(0.5))
    return scored.select(
        F.col(id_col),
        "term",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("doc_freq").cast("bigint").alias("doc_freq"),
        F.col("dl").cast("bigint").alias("dl"),
        F.floor(F.lit(1e6) * tf_sat).cast("bigint").alias("tf_sat_e6"),
        F.floor(F.lit(1e6) * idf_rational).cast("bigint").alias("idf_rational_e6"),
    )


def posting_lists(
    df: DataFrame,
    probe_terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional inverted-index postings for ``probe_terms``: one row
    per (term, doc) with the term frequency and the 0-based token
    positions as a comma-joined string — the retrieval structure phrase
    and proximity queries read (positions make "term A within k tokens
    of term B" a postings-only computation, no document re-scan).

    The probe list is broadcast and filters BEFORE the aggregate, so
    only matching (doc, pos) rows ever shuffle. The full-index form of
    this operator is the same plan minus the semi-join, written
    partitioned by hash(term) — the posting build is one explode + one
    map-side-combined groupBy however large the corpus is, which is why
    search engines bulk-build indexes exactly this way.

    Positions serialize as a sorted CSV string (engine-portable; arrays
    stringify differently across engines)."""
    spark = df.sparkSession
    probes = spark.createDataFrame([(t,) for t in probe_terms], "term STRING")
    tok = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "pos", "term"
        ),
    )
    hits = tok.join(F.broadcast(probes), "term")
    return hits.groupBy("term", id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("tf"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("pos")),
                lambda p: p.cast("string"),
            ),
            ",",
        ).alias("positions"),
    )


def phrase_match(
    df: DataFrame,
    phrase: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact-phrase retrieval from positional postings: documents where
    ``phrase``'s terms occur at consecutive token positions, with the
    match count and first match position — the proximity step a search
    stack runs AFTER the postings fetch, never by re-scanning documents.

    The plan is the postings build restricted to the phrase's terms
    (broadcast semi-join before anything shuffles) followed by an
    n-way self-equi-join on (doc, offset-aligned position): term i must
    sit at pos = p0 + i. Join keys carry the position arithmetic, so
    every stage is an equi-join — work is proportional to the probe
    terms' posting sizes, independent of corpus width.

    Returns (id, n_matches, first_pos)."""
    assert len(phrase) >= 2, "a phrase needs at least two terms"
    spark = df.sparkSession
    probes = spark.createDataFrame(
        [(t,) for t in set(phrase)], "term STRING"
    )
    tok = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.lower(F.col(text_col)), " ")).alias(
            "pos", "term"
        ),
    ).join(F.broadcast(probes), "term")
    base = tok.filter(F.col("term") == phrase[0]).select(
        F.col(id_col), F.col("pos").alias("p0")
    )
    for i, term in enumerate(phrase[1:], start=1):
        nxt = tok.filter(F.col("term") == term).select(
            F.col(id_col), (F.col("pos") - i).alias("p0")
        )
        base = base.join(nxt, [id_col, "p0"])
    return base.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_matches"),
        F.min("p0").cast("bigint").alias("first_pos"),
    )
