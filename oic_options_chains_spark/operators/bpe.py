"""Iterative BPE merge training on the corpus word-frequency table.

``q_bpe_pairs`` (operators/lm.bpe_pair_counts) computes the argmax
statistic of the FIRST merge; this module runs the actual training
loop: R rounds of count-adjacent-pairs -> pick the most frequent pair
-> merge it everywhere — the Sennrich et al. 2016 algorithm, the
standard tokenizer-construction step of an LLM data pipeline.

Spark-first design:

- Training runs over the WORD-FREQUENCY table, not the corpus: one
  corpus-sized shuffle builds (word, n) once, and every subsequent
  round touches a vocabulary-sized relation (classic BPE — pair counts
  are weighted by word frequency). At 100 TB the corpus scan happens
  once; the loop is cheap.
- The symbol state of a word is a DELIMITED STRING (' a  b  c ':
  tokens separated by TWO spaces, single-space sentinels at the ends),
  not an array: merging pair (x, y) is then one JVM-side literal
  ``replace(s, ' x  y ', ' xy ')``, whose left-to-right non-overlapping
  semantics (Java ``String.replace``) are exactly BPE's leftmost-
  non-overlapping merge — and exactly SQL ``replace`` in DuckDB, which
  is what makes the whole loop oracle-checkable. The two-space
  separator is load-bearing: with single spaces, adjacent occurrences
  (' a b a b ') share the middle delimiter and the second merge is
  missed; with doubled separators each match consumes only one of the
  two, so ' a  b  a  b ' -> ' ab  ab ' in one round as BPE requires.
- Pair extraction is shuffle-free per row (split + slice + zip_with);
  the per-round aggregation shuffles only the (left, right) pair
  domain (bounded by vocab * word length), and the argmax is ONE
  collected row per round (bounded driver collect by construction,
  like the k-means moment fold).
- Each round's state is localCheckpointed: the lineage would otherwise
  grow by one replace per round and re-run the whole prefix of the
  loop at every action (the Lloyd-iteration lesson, operators/kmeans).

Determinism: counts are exact integers; the argmax tie-break is
(count DESC, left ASC, right ASC); merges on ties therefore replay
identically on any engine/partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _word_state(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(word, n, s): corpus word frequencies with the initial symbol
    state ' c h a r s ' (sentinel-spaced single characters)."""
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word")
        )
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    # 'abc' -> ' a  b  c  ' (regexp adds the two-space separator per
    # char; prepend the leading sentinel) — mirrored verbatim in SQL
    return words.select(
        "word",
        "n",
        F.concat(F.lit(" "), F.regexp_replace("word", "(.)", "$1  ")).alias("s"),
    )


def _pair_counts(state: DataFrame) -> DataFrame:
    """(left, right, pair_n): adjacent-symbol pair counts weighted by
    word frequency. Row-local extraction; one pair-domain shuffle."""
    toks = F.split(F.trim(F.col("s")), "  ")
    pairs = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        state.select(F.explode(pairs).alias("p"), "n")
        .select(F.col("p.l").alias("left"), F.col("p.r").alias("right"), "n")
        .groupBy("left", "right")
        .agg(F.sum("n").cast("bigint").alias("pair_n"))
    )


def _apply_merge(state: DataFrame, left: str, right: str) -> DataFrame:
    return state.withColumn(
        "s",
        F.expr(
            "replace(s, concat(' ', {l}, '  ', {r}, ' '), "
            "concat(' ', {l}, {r}, ' '))".format(l=_sql_str(left), r=_sql_str(right))
        ),
    )


# The trainer is one DRIVER ROUND-TRIP per merge: each round runs a
# pair-count aggregation, a limit(1) collect, and a localCheckpoint.
# That is the textbook sequential-BPE dependency structure (merge r+1's
# counts depend on merge r having been applied), so wall time is
# Theta(rounds) cluster round-trips no matter the cluster size — fine
# for the tokenizer-prep scale this operator serves (hundreds of
# merges), pathological if someone asks for a GPT-scale 50k-merge vocab.
# The cap makes that misuse loud instead of silently hours-long; batched
# top-k-merges-per-round is the documented approximation to reach for
# beyond it (it changes the learned vocab, so it is not the default).
MAX_TRAIN_ROUNDS = 4096


def _bpe_train_state(
    docs: DataFrame, rounds: int, id_col: str, text_col: str
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Run the training loop ONCE and return both products: the merge
    list and the final (already localCheckpointed) word-symbol state.
    bpe_vocab / bpe_encode_stats consume the state directly instead of
    re-running training and re-applying every merge as an
    un-checkpointed withColumn chain (which regrew per-round lineage —
    quadratic plan size in merge count).

    ``rounds`` is capped at :data:`MAX_TRAIN_ROUNDS` — see the cap's
    comment for why the loop is inherently rounds-sequential."""
    if rounds > MAX_TRAIN_ROUNDS:
        raise ValueError(
            f"bpe_train rounds={rounds} exceeds MAX_TRAIN_ROUNDS="
            f"{MAX_TRAIN_ROUNDS}: each merge is a sequential driver "
            "round-trip (count -> collect(1) -> checkpoint), so large "
            "vocabs want batched top-k merges per round, not this loop"
        )
    state = _word_state(docs, id_col, text_col).localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        top = (
            _pair_counts(state)
            .orderBy(F.col("pair_n").desc(), F.col("left"), F.col("right"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        left, right, pair_n = top[0]["left"], top[0]["right"], top[0]["pair_n"]
        merges.append((r, left, right, pair_n))
        state = _apply_merge(state, left, right).localCheckpoint(eager=True)
    return merges, state


def bpe_train(
    docs: DataFrame,
    rounds: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The learned merge table: (round, left_tok, right_tok, pair_n) — one row
    per merge round, in training order. Stops early if no pair remains
    (every word fully merged)."""
    merges, _ = _bpe_train_state(docs, rounds, id_col, text_col)
    return docs.sparkSession.createDataFrame(
        merges, "round int, left_tok string, right_tok string, pair_n bigint"
    )


def bpe_vocab(
    docs: DataFrame,
    rounds: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_n: int = 1,
) -> DataFrame:
    """The token vocabulary AFTER ``rounds`` merges: (token, total_n) —
    every symbol of every word's final state, weighted by word
    frequency. What the tokenizer ships. Reuses the training loop's own
    checkpointed end state — no merge replay."""
    _, state = _bpe_train_state(docs, rounds, id_col, text_col)
    return (
        state.select(
            F.explode(F.split(F.trim(F.col("s")), "  ")).alias("token"), "n"
        )
        .groupBy("token")
        .agg(F.sum("n").cast("bigint").alias("total_n"))
        .filter(F.col("total_n") >= min_n)
    )


def _sql_str(s: str) -> str:
    """SQL single-quoted literal (symbols come from corpus text, so
    quoting matters)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def bpe_encode_stats(
    docs: DataFrame,
    rounds: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize the corpus with the trained merges: (doc_id, n_words,
    n_tokens) per document — the fertility/compression measurement that
    decides whether a tokenizer is worth shipping.

    The 100 TB shape: training already reduced the corpus to the
    word-frequency table, and the word -> final-symbol-count mapping IS
    that table's end state — a vocabulary-sized dimension (reused from
    the training loop's checkpoint, not re-derived). Encoding the
    corpus is therefore one explode (row-local) plus one broadcast join
    against that dimension and a per-doc sum: the corpus is never
    string-rewritten, only its words are looked up."""
    _, state = _bpe_train_state(docs, rounds, id_col, text_col)
    word_tokens = state.select(
        "word", F.size(F.split(F.trim(F.col("s")), "  ")).alias("w_tokens")
    )
    doc_words = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("word"),
        )
        .filter(F.length("word") > 0)
    )
    return (
        doc_words.join(F.broadcast(word_tokens), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("w_tokens").cast("bigint").alias("n_tokens"),
        )
    )
