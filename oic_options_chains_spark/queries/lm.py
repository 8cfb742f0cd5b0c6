"""LM/tokenizer-prep t2 queries over ``operators/lm.py``: TF-IDF
keywords, the bigram next-token table, and BPE pair counts.

Oracle notes: tokenization is the shared convention —
``string_split(lower(text), ' ')`` — and every output column is integer
or string. The tf/df ranking divide is the one double, mirrored with
identical operand order on both engines and absent from the schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from oic_options_chains_spark.operators.lm import (
    bigram_coverage,
    bigram_next_token,
    bpe_pair_counts,
    tfidf_topk_terms,
)
from oic_options_chains_spark.queries.registry import register
from oic_options_chains_spark.sources.registry import load_table


@register(
    "q_keywords_tfidf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, term),
    dfreq AS (SELECT term, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
              FROM tok GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             CAST(tf.tf AS DOUBLE) / CAST(dfreq.df AS DOUBLE) AS score
      FROM tf JOIN dfreq ON tf.term = dfreq.term)
    SELECT doc_id, term, tf, df, CAST(rank AS INT) AS rank FROM (
      SELECT doc_id, term, tf, df,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term ASC) AS rank
      FROM scored)
    WHERE rank <= 3
    """,
)
def q_keywords_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf/df (N cancels for
    within-doc ranking, so no log and no corpus constant): one corpus
    shuffle on (doc, term), vocabulary-sized df broadcast back."""
    d = load_table(spark, sf_dir, "documents")
    return tfidf_topk_terms(d, topk=3)


@register(
    "q_bigram_model",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token,
             unnest(range(0, len(string_split(lower(text), ' ')))) AS pos
      FROM documents),
    pairs AS (
      SELECT a.token AS token, b.token AS next_token
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    counts AS (
      SELECT token, next_token, CAST(COUNT(*) AS BIGINT) AS pair_n
      FROM pairs GROUP BY token, next_token)
    SELECT token, next_token, pair_n FROM (
      SELECT token, next_token, pair_n,
             row_number() OVER (PARTITION BY token
                                ORDER BY pair_n DESC, next_token ASC) AS rn
      FROM counts WHERE pair_n >= 3)
    WHERE rn = 1
    """,
)
def q_bigram_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modal successor per token (support >= 3): the bigram-LM next-token
    table. Spark builds pairs shuffle-free by zipping the token array
    against its own shift; the oracle proves the same relation with a
    positional self-join."""
    d = load_table(spark, sf_dir, "documents")
    return bigram_next_token(d, min_pairs=3)


@register(
    "q_bpe_pairs",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents),
    pair AS (
      SELECT substring(token, CAST(i AS INT), 2) AS pair
      FROM (SELECT token, unnest(range(1, len(token))) AS i
            FROM tok WHERE len(token) >= 2)),
    counts AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS pair_n
               FROM pair GROUP BY pair)
    SELECT pair, pair_n, CAST(rank AS INT) AS rank FROM (
      SELECT pair, pair_n,
             row_number() OVER (ORDER BY pair_n DESC, pair ASC) AS rank
      FROM counts)
    WHERE rank <= 20
    """,
)
def q_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent character pairs weighted by occurrence — the
    argmax statistic of the first BPE merge. Alphabet-pair keys reduce
    map-side; only the bounded-domain top-N sort is single-reducer."""
    d = load_table(spark, sf_dir, "documents")
    return bpe_pair_counts(d, topk=20)


@register(
    "q_bigram_coverage",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token,
             unnest(range(0, len(string_split(lower(text), ' ')))) AS pos
      FROM documents),
    pairs AS (
      SELECT a.doc_id, a.token || ' ' || b.token AS bigram
      FROM tok a JOIN tok b
        ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    ref AS (
      SELECT bigram FROM (
        SELECT bigram, COUNT(DISTINCT doc_id) AS df
        FROM pairs GROUP BY bigram)
      WHERE df >= 20),
    per_doc AS (
      SELECT p.doc_id, COUNT(*) AS n_bigrams,
             SUM(CASE WHEN r.bigram IS NOT NULL THEN 1 ELSE 0 END) AS n_hits
      FROM pairs p LEFT JOIN ref r ON p.bigram = r.bigram
      GROUP BY p.doc_id)
    SELECT d.doc_id,
           CAST(COALESCE(h.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits
    FROM documents d LEFT JOIN per_doc h ON d.doc_id = h.doc_id
    """,
)
def q_bigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document common-bigram coverage (operators/lm.bigram_coverage):
    the integer-exact perplexity-gate stand-in — documents whose bigram
    stream rarely intersects the corpus's frequent bigrams are the
    outliers an n-gram LM filter would flag. Shuffle-free pair build
    (array shift zip), vocabulary-sized reference broadcast back."""
    d = load_table(spark, sf_dir, "documents")
    return bigram_coverage(d, min_df=20)


@register(
    "q_cooccur_pairs",
    oracle="""
    WITH raw AS (
      SELECT doc_id AS id,
             unnest(list_distinct(string_split(lower(text), ' '))) AS token
      FROM documents),
    b AS (SELECT id, token FROM raw WHERE length(token) >= 4),
    vocab AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df_cnt
              FROM b GROUP BY 1 HAVING COUNT(*) >= 25),
    ranked AS (
      SELECT b.id, b.token,
             row_number() OVER (PARTITION BY b.id
                                ORDER BY v.df_cnt, b.token) AS rk
      FROM b JOIN vocab v ON b.token = v.token),
    keep AS (SELECT id, token FROM ranked WHERE rk <= 20)
    SELECT l.token AS t1, r.token AS t2, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM keep l JOIN keep r ON l.id = r.id AND l.token < r.token
    GROUP BY 1, 2 HAVING COUNT(*) >= 10
    """,
)
def q_cooccur_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-token co-occurrence pairs (market-basket) with a-priori
    pruning and the rarest-first per-doc prefix cap
    (operators/basket.frequent_cooccurrence): which informative terms
    travel together — topic signatures and boilerplate-phrase detection
    at corpus scale, with per-doc pair work bounded at C(20, 2)."""
    from oic_options_chains_spark.operators.basket import frequent_cooccurrence

    d = load_table(spark, sf_dir, "documents")
    return frequent_cooccurrence(
        d, "doc_id", "text", min_df=25, max_per_doc=20, min_pair=10
    )


@register(
    "q_lm_score",
    oracle="""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token,
             unnest(range(0, len(string_split(lower(text), ' ')))) AS pos
      FROM documents),
    dp AS (
      SELECT a.doc_id, a.token AS w1, b.token AS w2
      FROM tok a JOIN tok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
           FROM dp GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
    v AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM c1),
    model AS (
      SELECT c2.w1, c2.w2,
             CAST((CAST(c2 + 1 AS HUGEINT) * 1048576)
                  // CAST(c1 + v AS HUGEINT) AS BIGINT) AS p_sc
      FROM c2 JOIN c1 ON c2.w1 = c1.w1 CROSS JOIN v),
    scored AS (
      SELECT dp.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             SUM(CAST(p_sc AS HUGEINT)) AS t
      FROM dp JOIN model ON dp.w1 = model.w1 AND dp.w2 = model.w2
      GROUP BY 1)
    SELECT doc_id, n_bigrams,
           CAST(t // n_bigrams AS BIGINT) AS lm_score
    FROM scored
    """,
)
def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality score per document (Wenzek et al. 2020):
    mean scaled add-1 bigram probability under the corpus's own bigram
    model — the perplexity-bucket signal, computed log-free in exact
    integers (operators/lm.lm_quality_scores). The model is a Zipf-tiny
    count table; the corpus pays the pair shuffle, the model join, and
    one doc-keyed aggregate."""
    from oic_options_chains_spark.operators.lm import lm_quality_scores

    d = load_table(spark, sf_dir, "documents")
    return lm_quality_scores(d)


@register(
    "q_nb_classifier",
    oracle="""
    WITH base AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
    train AS (SELECT * FROM base WHERE doc_id % 5 <> 0),
    test AS (SELECT * FROM base WHERE doc_id % 5 = 0),
    tt AS (SELECT lang, unnest(string_split(t, ' ')) AS w FROM train),
    c AS (SELECT lang, w, CAST(COUNT(*) AS BIGINT) AS c FROM tt GROUP BY 1, 2),
    cw AS (SELECT w, CAST(SUM(c) AS BIGINT) AS cw FROM c GROUP BY 1),
    classes AS (SELECT DISTINCT lang FROM train),
    ncls AS (SELECT CAST(COUNT(*) AS BIGINT) AS ncls FROM classes),
    model AS (
      SELECT cl.lang, cw.w,
             CAST((CAST(COALESCE(c.c, 0) + 1 AS HUGEINT) * 1048576)
                  // CAST(cw.cw + ncls.ncls AS HUGEINT) AS BIGINT) AS r_sc
      FROM cw CROSS JOIN classes cl CROSS JOIN ncls
      LEFT JOIN c ON c.lang = cl.lang AND c.w = cw.w),
    tc AS (
      SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS n_w
      FROM (SELECT doc_id, unnest(string_split(t, ' ')) AS w FROM test)
      GROUP BY 1, 2),
    scored AS (
      SELECT tc.doc_id, m.lang,
             SUM(CAST(n_w AS HUGEINT) * m.r_sc) AS score
      FROM tc JOIN model m ON m.w = tc.w
      GROUP BY 1, 2),
    pred AS (
      SELECT doc_id, lang AS lang_pred,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang ASC) AS rk
      FROM scored)
    SELECT t.lang AS lang_true, p.lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred p JOIN test t ON p.doc_id = t.doc_id
    WHERE p.rk = 1
    GROUP BY 1, 2
    """,
)
def q_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out confusion matrix of the log-free token-posterior-voting
    classifier trained on the corpus's own labels
    (operators/lm.nb_class_confusion) — the fastText-style linear router
    of CCNet-era curation, with the 20% doc_id%5==0 split as test.
    Integer-exact scaled-posterior voting (argmax_c Σ n_w·P(c|w)), argmax
    per doc via a |classes|-deep window."""
    from oic_options_chains_spark.operators.lm import nb_class_confusion

    d = load_table(spark, sf_dir, "documents")
    return nb_class_confusion(d, class_col="lang", holdout_mod=5)


_BPE_ROUNDS = 4


def _bpe_cte(rounds: int = _BPE_ROUNDS) -> str:
    """CTE blocks unrolling the BPE training loop of ``operators/bpe``:
    w0 is the word-frequency table with the two-space-delimited symbol
    state; per round r, p{r} counts adjacent pairs, m{r} is the argmax
    merge (count DESC, pair ASC), w{r} the state with it applied via
    the same literal ``replace`` protocol the Spark side uses."""
    parts = [
        """
    WITH w0 AS (
      SELECT word, n, ' ' || regexp_replace(word, '(.)', '\\1  ', 'g') AS s
      FROM (SELECT word, CAST(COUNT(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
                  FROM documents)
            WHERE len(word) > 0 GROUP BY word))"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""
    px{r} AS (SELECT toks, n, unnest(range(1, len(toks))) AS i
              FROM (SELECT string_split(trim(s), '  ') AS toks, n
                    FROM w{r - 1})),
    p{r} AS (SELECT toks[i] AS lft, toks[i + 1] AS rgt,
                    CAST(SUM(n) AS BIGINT) AS pair_n
             FROM px{r} GROUP BY 1, 2),
    m{r} AS (SELECT lft, rgt, pair_n FROM p{r}
             ORDER BY pair_n DESC, lft, rgt LIMIT 1),
    w{r} AS (SELECT word, n,
                    replace(s,
                            ' ' || (SELECT lft FROM m{r}) || '  ' ||
                            (SELECT rgt FROM m{r}) || ' ',
                            ' ' || (SELECT lft FROM m{r}) ||
                            (SELECT rgt FROM m{r}) || ' ') AS s
             FROM w{r - 1})"""
        )
    return ",".join(parts)


@register(
    "q_bpe_train",
    oracle=_bpe_cte()
    + "\n    "
    + "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS round, lft AS left_tok, "
        f"rgt AS right_tok, pair_n FROM m{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    ),
)
def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first 4 learned BPE merges (Sennrich et al. 2016) over the
    corpus word-frequency table — the actual tokenizer-training loop,
    not just the first-merge statistic (q_bpe_pairs). Each round is one
    vocabulary-sized pair aggregation plus a single collected argmax
    row; the merge applies as a literal string replace whose leftmost-
    non-overlapping semantics the oracle replays exactly (see
    operators/bpe.py for the two-space delimiter protocol that makes
    adjacent occurrences merge correctly)."""
    from oic_options_chains_spark.operators.bpe import bpe_train

    d = load_table(spark, sf_dir, "documents")
    return bpe_train(d, rounds=_BPE_ROUNDS)


@register(
    "q_bpe_vocab",
    oracle=_bpe_cte()
    + f"""
    SELECT token, CAST(SUM(n) AS BIGINT) AS total_n FROM (
      SELECT unnest(string_split(trim(s), '  ')) AS token, n
      FROM w{_BPE_ROUNDS})
    GROUP BY token
    """,
)
def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The token vocabulary after the 4 trained merges: every word's
    final symbols weighted by word frequency — what the tokenizer ships
    (base alphabet + merged units). Proves the merge REWRITE side of
    training end-to-end, not just the argmax choices."""
    from oic_options_chains_spark.operators.bpe import bpe_vocab

    d = load_table(spark, sf_dir, "documents")
    return bpe_vocab(d, rounds=_BPE_ROUNDS)


@register(
    "q_bpe_encode",
    oracle=_bpe_cte()
    + f"""
    , wt AS (SELECT word, len(string_split(trim(s), '  ')) AS w_tokens
             FROM w{_BPE_ROUNDS}),
    dw AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
           FROM documents)
    SELECT dw.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(wt.w_tokens) AS BIGINT) AS n_tokens
    FROM dw JOIN wt ON dw.word = wt.word
    WHERE len(dw.word) > 0
    GROUP BY dw.doc_id
    """,
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus tokenization with the 4 trained merges: per-document word
    and BPE-token counts — the fertility measurement that judges the
    tokenizer. The corpus is never string-rewritten: the trained word ->
    token-count mapping is a vocabulary-sized broadcast dimension and
    encoding is explode + broadcast join + per-doc sum (the plan you
    want at 100 TB)."""
    from oic_options_chains_spark.operators.bpe import bpe_encode_stats

    d = load_table(spark, sf_dir, "documents")
    return bpe_encode_stats(d, rounds=_BPE_ROUNDS)


_SEG_MAXPOS = 16
_SEG_MINFREQ = 50


def _seg_cte(max_pos: int = _SEG_MAXPOS, min_freq: int = _SEG_MINFREQ) -> str:
    """Unrolled per-position Viterbi DP for dictionary max-match
    segmentation (operators/segment.maxmatch_segment): b{i} holds each
    word's best (score, length-sequence) reaching character position i,
    extended from b{i-L} by an L-char piece (L=1 always legal; L in
    2..4 gated on vocab membership), argmax by (score DESC, lens DESC).
    Same integer objective as the Spark side, so winners replay
    bit-identically."""
    parts = [
        f"""
    WITH w AS MATERIALIZED (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest(string_split(lower(text), ' ')) AS word
            FROM documents)
      WHERE len(word) BETWEEN 1 AND {max_pos} GROUP BY word),
    pc AS (
      SELECT substr(word, CAST(i AS INT) + 1, CAST(L AS INT)) AS piece,
             SUM(n) AS piece_n
      FROM (SELECT word, n, unnest(range(0, len(word) - 1)) AS i FROM w
            WHERE len(word) >= 2),
           (SELECT unnest(range(2, 5)) AS L)
      WHERE i + L <= len(word)
      GROUP BY 1),
    vocab AS MATERIALIZED (SELECT piece FROM pc WHERE piece_n >= {min_freq}),
    b0 AS (SELECT word, n, CAST(0 AS BIGINT) AS score,
                  CAST([] AS INT[]) AS lens FROM w)"""
    ]
    for i in range(1, max_pos + 1):
        branches = [
            f"""
        SELECT word, n, score + 1 AS score,
               list_concat(lens, [CAST(1 AS INT)]) AS lens
        FROM b{i - 1} WHERE len(word) >= {i}"""
        ]
        for L in range(2, 5):
            if i - L < 0:
                break
            branches.append(
                f"""
        SELECT word, n, score + {L * L} AS score,
               list_concat(lens, [CAST({L} AS INT)]) AS lens
        FROM b{i - L} WHERE len(word) >= {i}
          AND substr(word, {i - L + 1}, {L}) IN (SELECT piece FROM vocab)"""
            )
        union = "\n        UNION ALL".join(branches)
        parts.append(
            f""",
    b{i} AS MATERIALIZED (
      SELECT word, n, score, lens FROM (
        SELECT word, n, score, lens,
               row_number() OVER (PARTITION BY word
                                  ORDER BY score DESC, lens DESC) AS rn
        FROM ({union})) WHERE rn = 1)"""
        )
    done = "\n        UNION ALL ".join(
        f"SELECT word, n, score, lens FROM b{i} WHERE len(word) = {i}"
        for i in range(1, max_pos + 1)
    )
    parts.append(f""",
    done AS ({done})""")
    return "".join(parts)


@register(
    "q_maxmatch_segment",
    oracle=_seg_cte()
    + """
    SELECT word, n,
           array_to_string(
             list_transform(range(1, len(lens) + 1),
               k -> substr(word,
                           CAST(COALESCE(list_sum(lens[1:CAST(k AS INT) - 1]),
                                         0) AS INT) + 1,
                           lens[CAST(k AS INT)])),
             ' ') AS pieces,
           CAST(len(lens) AS BIGINT) AS n_pieces,
           score
    FROM done
    """,
)
def q_maxmatch_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-tokenizer inference (operators/segment.maxmatch_segment):
    every corpus word (<=16 chars) segmented into corpus-derived
    substring-vocabulary pieces by an exact-integer Viterbi DP — max
    sum(len^2), ties to the longest first piece. The vocab is the
    substring frequency table thresholded at 50; single characters are
    the always-available fallback, so there is no UNK."""
    from oic_options_chains_spark.operators.segment import (
        maxmatch_segment,
        substring_vocab,
        word_freqs,
    )

    d = load_table(spark, sf_dir, "documents")
    w = word_freqs(d)
    v = substring_vocab(w, min_len=2, max_len=4, min_freq=_SEG_MINFREQ)
    return maxmatch_segment(w, v)
