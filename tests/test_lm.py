"""LM-prep operators: TF-IDF ranking, bigram table, BPE pair counts."""

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.lm import (
    bigram_next_token,
    bpe_pair_counts,
    tfidf_topk_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_tfidf_prefers_rare_terms(spark):
    df = _docs(
        spark,
        [
            (1, "common rare1 common"),
            (2, "common rare2"),
            (3, "common other"),
        ],
    )
    top = {r.doc_id: r.term for r in tfidf_topk_terms(df, topk=1).collect()}
    # 'common' scores tf/df <= 2/3 everywhere; a doc-unique term (1/1) wins
    assert top[1] == "rare1" and top[2] == "rare2" and top[3] == "other"


def test_tfidf_rank_dense_and_capped(spark):
    df = _docs(spark, [(1, "a b c d e f"), (2, "a a")])
    rows = tfidf_topk_terms(df, topk=3).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.rank)
    assert sorted(by_doc[1]) == [1, 2, 3]
    assert sorted(by_doc[2]) == [1]  # only one distinct term


def test_bigram_modal_successor(spark):
    df = _docs(
        spark,
        [(1, "to be or not to be"), (2, "to be is to do"), (3, "to be to be")],
    )
    got = {r.token: (r.next_token, r.pair_n) for r in bigram_next_token(df, min_pairs=2).collect()}
    # 'to be' appears 5x — modal successor of 'to' with support 5
    assert got["to"] == ("be", 5)
    # single-doc tokens below min_pairs are filtered
    assert "is" not in got and "not" not in got


def test_bpe_pairs_weighted_by_occurrence(spark):
    df = _docs(spark, [(1, "abab abab"), (2, "abab zz")])
    rows = bpe_pair_counts(df, topk=2).collect()
    by_rank = {r.rank: (r.pair, r.pair_n) for r in rows}
    # 'abab' x3 occurrences: 'ab' 2 per occurrence = 6; 'ba' 1 per = 3
    assert by_rank[1] == ("ab", 6)
    assert by_rank[2] == ("ba", 3)


def test_bpe_skips_single_char_tokens(spark):
    df = _docs(spark, [(1, "a b c xy")])
    rows = bpe_pair_counts(df, topk=10).collect()
    assert [(r.pair, r.pair_n) for r in rows] == [("xy", 1)]


def test_bigram_pairs_stay_within_document(spark):
    # last token of doc 1 must not pair with first token of doc 2
    df = _docs(spark, [(1, "x end"), (2, "start y"), (3, "end start"), (4, "end start")])
    got = bigram_next_token(df, min_pairs=1)
    pairs = {(r.token, r.next_token) for r in got.collect()}
    assert ("end", "start") in pairs  # from docs 3 and 4 only, count 2
    row = got.filter(F.col("token") == "end").collect()[0]
    assert row.pair_n == 2


def test_lm_score_ranks_fluent_above_garbage(spark):
    from oic_options_chains_spark.operators.lm import lm_quality_scores

    common = "the cat sat on the mat"
    rows = (
        # corpus body: repeated fluent pattern trains the model
        [(i, common) for i in range(20)]
        # fluent candidate reuses trained bigrams; garbage never seen
        + [(100, common), (101, "qq zz xx vv qq ww")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = {r.doc_id: r.lm_score for r in lm_quality_scores(df).collect()}
    assert s[100] > s[101]


def test_lm_score_excludes_single_token_docs(spark):
    from oic_options_chains_spark.operators.lm import lm_quality_scores

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "loner")], "doc_id long, text string"
    )
    out = lm_quality_scores(df).collect()
    assert [r.doc_id for r in out] == [1]


def test_lm_score_partition_invariant(spark):
    from oic_options_chains_spark.operators.lm import lm_quality_scores

    rows = [(i, f"tok{i % 7} tok{(i + 1) % 7} tok{(i + 2) % 5}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = lm_quality_scores(df.repartition(1)).collect()
    b = lm_quality_scores(df.repartition(9, "text")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
