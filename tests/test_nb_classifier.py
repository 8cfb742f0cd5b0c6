"""Token-posterior-voting classifier (operators/lm.nb_class_confusion).

The registry query (q_nb_classifier) proves cross-engine exactness on the
synthetic corpus, where the lang label is INDEPENDENT of the text — there
the correct behavior is falling back to the majority class. These tests
prove the discriminative path on a corpus whose vocabulary actually
carries the label, and the fallback behavior on the no-signal one.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.lm import nb_class_confusion


def _labeled_corpus(spark, n=200):
    """Three 'languages' with mostly-disjoint vocab plus shared filler:
    ids cycle through the classes so the %5 holdout hits each."""
    vocab = {
        "aa": "alpha beta gamma delta", "bb": "uno dos tres cuatro",
        "cc": "eins zwei drei vier",
    }
    rows = []
    for i in range(n):
        cls = ["aa", "bb", "cc"][i % 3]
        own = vocab[cls].split()
        text = " ".join(own[i % 4:] + own[: i % 4] + ["the", "and"] + own)
        rows.append((i, cls, text))
    return spark.createDataFrame(rows, "doc_id bigint, lang string, text string")


def test_perfect_separation_on_disjoint_vocab(spark):
    df = _labeled_corpus(spark)
    conf = nb_class_confusion(df, class_col="lang", holdout_mod=5).collect()
    off_diag = [r for r in conf if r["lang_true"] != r["lang_pred"]]
    assert off_diag == []
    assert sum(r["n_docs"] for r in conf) == 200 // 5


def test_no_signal_falls_back_to_majority(spark, sf_dir):
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    conf = nb_class_confusion(d, class_col="lang", holdout_mod=5)
    majority = (
        d.filter(F.col("doc_id") % 5 != 0)
        .groupBy("lang").count().orderBy(F.col("count").desc(), "lang")
        .first()["lang"]
    )
    # shared vocabulary => every token's posterior vote is the class
    # share => the argmax is the training majority class for most docs
    top_pred = (
        conf.groupBy("lang_pred").agg(F.sum("n_docs").alias("n"))
        .orderBy(F.col("n").desc()).first()["lang_pred"]
    )
    assert top_pred == majority


def test_every_test_doc_is_classified_once(spark):
    df = _labeled_corpus(spark)
    conf = nb_class_confusion(df, class_col="lang", holdout_mod=5)
    n_test = df.filter(F.col("doc_id") % 5 == 0).count()
    assert conf.agg(F.sum("n_docs")).first()[0] == n_test
