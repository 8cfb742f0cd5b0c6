"""Benchmark decontamination: flag corpus documents that share n-gram
content with a held-out evaluation set.

Standard practice for training corpora (GPT-3 App. C, PaLM sec. 8): any
training document containing an n-gram that also appears in an eval
benchmark is suspect and gets dropped or audited. The expensive way is a
corpus x benchmark string scan; the scalable way — used here — is a
shingle-level equi-join:

  corpus shingles  JOIN  distinct benchmark shingles  ON shingle

The benchmark side is small by definition (eval sets are thousands of
documents, not billions), so Spark broadcasts it and the probe is a
map-side hash lookup — the corpus never shuffles for the join itself.
The only corpus-wide exchanges are the doc-id-keyed ones shingling and
the per-document overlap count already need, and both key on doc_id so
AQE reuses a single partitioning.

Determinism: shingling matches operators/minhash.doc_shingles (lowercase,
single-space word n-grams), so decontamination and dedup agree on what a
"phrase" is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from oic_options_chains_spark.operators.minhash import doc_shingles


def boilerplate_scores(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    df_threshold: int = 3,
) -> DataFrame:
    """Corpus-wide boilerplate gate (C4/RefinedWeb style): a shingle that
    appears in >= df_threshold distinct documents is boilerplate; each
    document is scored by how much of it is made of such shingles.

    Unlike repetition_metrics (intra-document) and contamination_counts
    (vs an external benchmark), this is a corpus-global signal: it needs
    the shingle document-frequency table. The plan is a shingle-keyed
    hash aggregate (map-side combine), one shingle-keyed equi-join of
    the corpus shingles against that DF table, and a doc-keyed score
    aggregate — strictly linear, no self-join or pairwise work. The
    Zipf head makes the join key skewed; AQE's skew-join splitting (on
    in session.py) handles that, and a DF-capped variant (drop shingles
    with df > cap from scoring, cf. minhash.ngram_jaccard_pairs_capped)
    is the fallback if a head shingle ever dominates a reducer.

    Returns id_col + (n_shingles, n_boiler, boiler_bp).
    """
    sh = doc_shingles(corpus, id_col=id_col, text_col=text_col, n=n)
    freq = sh.groupBy("shingle").agg(
        F.count(F.lit(1)).alias("df")
    )
    flagged = sh.join(freq, "shingle").select(
        id_col, (F.col("df") >= df_threshold).cast("int").alias("is_boiler")
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum("is_boiler").cast("bigint").alias("n_boiler"),
        F.floor(
            F.lit(10000.0)
            * F.sum("is_boiler").cast("double")
            / F.count(F.lit(1)).cast("double")
        ).cast("bigint").alias("boiler_bp"),
    )


def contamination_counts(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per corpus document: how many distinct n-gram shingles it shares
    with the benchmark, and a contamination flag (any overlap).

    Returns id_col + (n_overlap, contaminated). Documents with zero
    overlap are kept (n_overlap = 0) so the output is a total audit
    table, not just the hit list.
    """
    corpus_sh = doc_shingles(corpus, text_col=text_col, id_col=id_col, n=n)
    bench_sh = (
        doc_shingles(benchmark, text_col=text_col, id_col=id_col, n=n)
        .select("shingle")
        .distinct()
    )
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    return (
        corpus.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("bigint").alias("n_overlap"),
            (F.coalesce(F.col("n_overlap"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
