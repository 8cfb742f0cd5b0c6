"""Language-model prep operators: TF-IDF keyword extraction, bigram
next-token statistics, and the BPE pair-count step.

These close the tokenizer/LM loop over the corpus layer: after gates and
dedup (operators/text.py, minhash.py) and vocabulary/OOV prep
(operators/vocab.py), a training pipeline needs per-document keywords
(retrieval filtering / topic balancing), an n-gram next-token table
(contamination probes, cheap perplexity proxies), and the pair-frequency
aggregation at the core of BPE tokenizer training.

Cross-engine rules (same as the rest of the extension surface): every
cross-row aggregate is an integer count; the only float is the per-row
tf/df division in TF-IDF ranking — a single IEEE divide with fixed
operand order, identical on both engines, and it never reaches the
output schema.

Scale notes: all three operators reduce an exploded corpus with map-side
combine onto VOCABULARY-sized keys (terms, token pairs, char pairs), so
the shuffles carry dictionary-sized data, not corpus-sized. The per-doc
TF-IDF window partitions by doc_id (parallel); the bigram window
partitions by the left token (vocabulary keys); only the BPE top-N rank
is a single-reducer sort, over an alphabet-pair domain that is bounded
by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _term_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("term"),
    )


def tfidf_topk_terms(
    df: DataFrame,
    topk: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, df, rank): each document's ``topk`` most
    characteristic terms by tf/df ranking.

    For ranking WITHIN a document the corpus size N cancels out of
    tf * idf, so the score is the rational tf/df — evaluated as one
    per-row double divide (deterministic), tie-broken on term. The df
    side is a term-keyed aggregate (vocabulary-sized) broadcast back
    onto the tf side, so the corpus-sized relation shuffles once, on
    (doc, term)."""
    terms = _term_rows(df, id_col, text_col)
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency FROM tf, not from a second corpus explode: tf
    # holds exactly one row per (doc, term), so a plain count per term
    # over tf equals count_distinct(doc) over the raw term rows — and
    # both consumers of tf now share one exchange instead of planning
    # the tokenize+explode subtree twice.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(F.broadcast(dfreq), "term").withColumn(
        "score", F.col("tf").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
        .select(id_col, "term", "tf", "df", "rank")
    )


def bigram_next_token(
    df: DataFrame,
    min_pairs: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(token, next_token, pair_n): the modal successor of every token
    with at least ``min_pairs`` observed continuations — the next-token
    table of a bigram LM (contamination probes, cheap perplexity
    proxies, autocomplete-style QA of a corpus).

    Adjacent pairs come from the shared shift-zip builder
    (``text.adjacent_pairs``) — shuffle-free until the pair-count
    aggregate, which lands on vocabulary-squared-bounded (in practice
    Zipf-tiny) keys."""
    from oic_options_chains_spark.operators.text import adjacent_pairs

    pairs = df.select(
        F.explode(adjacent_pairs(F.col(text_col))).alias("p")
    ).select(
        F.col("p.w1").alias("token"), F.col("p.w2").alias("next_token")
    )
    counts = pairs.groupBy("token", "next_token").agg(
        F.count(F.lit(1)).alias("pair_n")
    )
    w = Window.partitionBy("token").orderBy(
        F.col("pair_n").desc(), F.col("next_token").asc()
    )
    return (
        counts.filter(F.col("pair_n") >= min_pairs)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("token", "next_token", F.col("pair_n").cast("bigint").alias("pair_n"))
    )


def bpe_pair_counts(
    df: DataFrame,
    topk: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """(pair, pair_n, rank): the ``topk`` most frequent adjacent
    character pairs across all token occurrences — exactly the statistic
    the first BPE merge maximizes (Sennrich et al. 2016), weighted by
    occurrence because the corpus is NOT pre-grouped by word.

    Each token of length L contributes its L-1 two-char substrings; the
    count aggregate reduces onto alphabet-pair keys map-side, so the
    exchange is character-set-sized. Only the final top-N rank is a
    single-reducer sort, over that same bounded domain."""
    tok = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("token")
    ).filter(F.length("token") >= 2)
    pair = tok.select(
        F.explode(F.sequence(F.lit(1), F.length("token") - 1)).alias("i"),
        F.col("token"),
    ).select(F.col("token").substr(F.col("i"), F.lit(2)).alias("pair"))
    counts = pair.groupBy("pair").agg(F.count(F.lit(1)).alias("pair_n"))
    w = Window.orderBy(F.col("pair_n").desc(), F.col("pair").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
        .select("pair", F.col("pair_n").cast("bigint").alias("pair_n"), "rank")
    )


def bigram_coverage(
    df: DataFrame,
    min_df: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_bigrams, n_hits): how much of each document's bigram
    stream is covered by the corpus's own common bigrams (those seen in
    at least ``min_df`` distinct documents) — the integer-exact stand-in
    for an n-gram LM perplexity gate (CCNet-style quality filtering):
    low-coverage documents are the distribution outliers a perplexity
    filter would flag, with no floating-point log in either engine.

    Plan: one corpus shuffle builds the bigram document frequencies
    (vocabulary-pair keys, map-side combined); the qualifying reference
    set joins back onto the per-document bigram stream (left join keyed
    on the bigram — Zipf-small reference relation, broadcastable), then
    a per-document count/sum. Documents with fewer than two tokens keep
    (0, 0) via the final left join from the input relation."""
    from oic_options_chains_spark.operators.text import bigram_strings

    pairs = df.select(
        F.col(id_col),
        F.explode(bigram_strings(F.col(text_col))).alias("bigram"),
    )
    ref = (
        pairs.groupBy("bigram")
        .agg(F.count_distinct(F.col(id_col)).alias("__df"))
        .filter(F.col("__df") >= min_df)
        .select("bigram", F.lit(1).alias("__hit"))
    )
    per_doc = (
        pairs.join(F.broadcast(ref), "bigram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.coalesce(F.sum("__hit"), F.lit(0)).alias("n_hits"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("bigint").alias("n_hits"),
        )
    )


def lm_quality_scores(
    df: DataFrame,
    scale: int = 1 << 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style LM quality scoring (Wenzek et al. 2020), log-free:
    train an add-1-smoothed bigram model on the corpus itself and score
    every document by its mean scaled bigram probability — fluent text
    scores high, shredded boilerplate/garbage scores low, and the score
    feeds the head/middle/tail quality split exactly like CCNet's
    KenLM perplexity buckets.

    (id, n_bigrams, lm_score) with
        p_sc(w1 w2) = floor( S * (c2(w1,w2)+1) / (c1(w1)+V) )
        lm_score    = floor( Σ p_sc / n_bigrams )
    where c1 is the bigram-PREFIX count (Σ_w2 c2), V the prefix vocab
    size, S = 2^20. All integer multiply + integer division in
    decimal(38,0) — no logarithm, no float, so the DuckDB oracle matches
    bit-for-bit (the perplexity ordering is the monotone image of the
    mean-probability ordering a consumer can log engine-locally).
    Single-token documents have no bigrams and are absent from the
    output (no evidence either way — callers treat missing as neutral).

    Scale shape: adjacent pairs come from the shift-zip (shuffle-free);
    the model is a vocabulary²-bounded (Zipf-tiny) aggregate of those
    pairs; scoring joins the pairs against the model on (w1, w2) — the
    model side is counts, not corpus, so AQE broadcasts it when small
    and co-shuffles otherwise — then one doc-keyed aggregate."""
    from oic_options_chains_spark.operators.text import adjacent_pairs

    dp = df.select(
        F.col(id_col), F.explode(adjacent_pairs(F.col(text_col))).alias("p")
    ).select(id_col, "p.w1", "p.w2")
    # w1/w2 are never NULL (split/concat_ws products), so this drops
    # nothing — it pins the SAME isnotnull constraint on every consumer
    # of dp so their subtrees canonicalize equal and the runtime reuses
    # the pair-count shuffle stages. Without it the scoring and model
    # joins pushed isnotnull into their copies while the vocab-count leg
    # stayed unfiltered: the r15 before-plan of q_lm_score ran the
    # corpus explode four times with zero ReusedExchange.
    dp = dp.where(F.col("w1").isNotNull() & F.col("w2").isNotNull())
    c2 = dp.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("bigint").alias("c1"))
    # the vocab size V rides a whole-relation window over the
    # vocabulary-sized c1 instead of a separate agg + crossJoin: the agg
    # form planned a THIRD copy of the corpus pair pipeline just to
    # count c1's rows (and the optimizer's redundant-aggregate rewrite
    # made that copy structurally unique, so stage reuse could never
    # recover it). The window costs one SinglePartition pass over the
    # Zipf-bounded prefix vocabulary — dictionary-sized, never corpus.
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c1 = c1.withColumn("v", F.count(F.lit(1)).over(w_all).cast("bigint"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    model = (
        c2.join(c1, "w1")
        .select(
            "w1",
            "w2",
            (dec(F.col("c2") + 1) * dec(F.lit(scale))).alias("__num"),
            dec(F.col("c1") + F.col("v")).alias("__den"),
        )
        .selectExpr("w1", "w2", "CAST(__num div __den AS BIGINT) AS p_sc")
    )
    return (
        dp.join(model, ["w1", "w2"])
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(dec(F.col("p_sc"))).alias("__t"),
        )
        .selectExpr(
            id_col, "n_bigrams", "CAST(__t div n_bigrams AS BIGINT) AS lm_score"
        )
    )


def nb_class_confusion(
    df: DataFrame,
    class_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    holdout_mod: int = 5,
    scale: int = 1 << 20,
) -> DataFrame:
    """Token-posterior-voting document classifier, log-free, evaluated on
    a held-out split — the fastText-style linear router LLM pipelines use
    for language/quality routing (CCNet's lang-id gate), with the
    corpus's own labels as supervision.

    Rows with ``id % holdout_mod == 0`` are the test split; the rest fit
    add-1-smoothed per-token class posteriors. A true multinomial-NB
    argmax needs the log-product Σ n_w·log p(w|c), and cross-engine
    logarithms are not bit-reproducible — the earlier mean-LIKELIHOOD
    surrogate (Σ n_w·p_sc(w|c)) is exact but degenerates to the majority
    class, because a linear sum of likelihoods never penalizes the tokens
    a class has NO evidence for. Voting with the per-token POSTERIOR
    fixes both at once:

        r_sc(w,c)  = floor( S * (count(w,c)+1) / (count(w,·)+|C|) )
        score(d,c) = Σ_w n_w(d) * r_sc(w,c)

    Each token distributes ~S of voting mass ACROSS the classes (Σ_c
    r_sc ≈ S for every w), so class-size imbalance cannot dominate, and
    a language-unique token votes ~S for its language and ~0 elsewhere —
    argmax_c Σ n_w·P(c|w), the sum-of-posteriors linear classifier. All
    arithmetic is integer multiply + integer division in decimal(38,0):
    bit-identical ranking on both engines. Out-of-vocabulary test tokens
    contribute the same floor(S/|C|) to every class, so they are dropped
    (inner join); a test doc that is ENTIRELY out-of-vocabulary has no
    evidence and is absent from the output on both engines.

    Returns the confusion matrix (class_true, class_pred, n_docs).

    Scale shape (100 TB): the model is a vocabulary×classes table
    (Zipf-tiny) from one token-keyed exchange with map-side combine;
    test docs reduce to (doc, word, n) — one doc-keyed exchange — then
    probe the broadcast model; argmax is a |classes|-deep window per doc.
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    base = df.select(
        F.col(id_col), F.col(class_col), F.lower(F.col(text_col)).alias("__t")
    )
    is_test = (F.col(id_col) % holdout_mod) == 0
    train, test = base.filter(~is_test), base.filter(is_test)

    tt = train.select(class_col, F.explode(F.split(F.col("__t"), " ")).alias("w"))
    c = tt.groupBy(class_col, "w").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    cw = c.groupBy("w").agg(F.sum("c").cast("bigint").alias("cw"))
    classes = train.select(class_col).distinct()
    ncls = classes.agg(F.count(F.lit(1)).cast("bigint").alias("ncls"))

    # densify: every (word, class) pair gets a posterior, smoothed —
    # vocab × |C| rows, still dictionary-sized
    model = (
        cw.crossJoin(F.broadcast(classes))
        .join(c, [class_col, "w"], "left")
        .crossJoin(F.broadcast(ncls))
        .select(
            class_col,
            "w",
            (dec(F.coalesce(F.col("c"), F.lit(0)) + 1) * scale).alias("__num"),
            dec(F.col("cw") + F.col("ncls")).alias("__den"),
        )
        .selectExpr(class_col, "w", "CAST(__num div __den AS BIGINT) AS r_sc")
    )

    tc = (
        test.select(F.col(id_col), F.explode(F.split(F.col("__t"), " ")).alias("w"))
        .groupBy(id_col, "w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_w"))
    )
    scored = (
        tc.join(model, "w")
        .groupBy(id_col, class_col)
        .agg(F.sum(dec(F.col("n_w")) * F.col("r_sc")).alias("__score"))
    )
    w_pred = Window.partitionBy(id_col).orderBy(
        F.col("__score").desc(), F.col(class_col).asc()
    )
    pred = (
        scored.withColumn("__rk", F.row_number().over(w_pred))
        .filter(F.col("__rk") == 1)
        .select(F.col(id_col), F.col(class_col).alias(f"{class_col}_pred"))
    )
    return (
        test.select(F.col(id_col), F.col(class_col).alias(f"{class_col}_true"))
        .join(pred, id_col)
        .groupBy(f"{class_col}_true", f"{class_col}_pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
