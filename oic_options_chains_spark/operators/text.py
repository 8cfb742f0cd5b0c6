"""Text-analysis operators for large-scale training-data pipelines.

All pure built-in Column expressions (whole-stage codegen, no Python UDFs):
tokenization, token/stopword counting, quality scoring, n-gram heuristic
language ID, and document fingerprinting.

Cross-engine determinism: ratios are computed in DOUBLE with a fixed
operation order and then FLOOR-scaled to integers (basis points / milli
units) — floor of bit-identical IEEE doubles is engine-independent,
unlike round.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS = ("the", "a", "of", "and", "or")

# Heuristic n-gram language-ID vocabularies over the synthetic corpus:
# three "languages" distinguished by word families.
LANG_VOCAB = {
    "article": r"\b(the|a|of)\b",
    "relational": r"\b(data|table|row|query)\b",
    "perf": r"\b(fast|slow|big|small)\b",
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(text), " ")


def token_count_ws(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text)).cast("bigint")


def adjacent_pairs(text: Column) -> Column:
    """array<struct<w1, w2>> of adjacent token pairs, shuffle-free: the
    token array zipped against its own shift. THE shared bigram builder
    — lm.bigram_next_token / lm.lm_quality_scores / lm.bigram_coverage /
    dsir.hashed_gram_counts all consume this one definition, so the
    tokenize-and-pair semantics (including the empty/one-token guard)
    cannot drift apart from the DuckDB oracles that replay them."""
    toks = tokens(text)
    n1 = F.greatest(F.size(toks) - 1, F.lit(0))
    return F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def bigram_strings(text: Column) -> Column:
    """array<string> of adjacent bigrams as "w1 w2" strings (the hashed
    n-gram / coverage form of ``adjacent_pairs``)."""
    return F.transform(
        adjacent_pairs(text), lambda p: F.concat_ws(" ", p["w1"], p["w2"])
    )


def token_count_re(text: Column, pattern: str = "[a-z0-9]+") -> Column:
    """Regex (BPE-ish word-piece) token count."""
    return F.regexp_count(F.lower(text), F.lit(pattern)).cast("bigint")


def stopword_count(text: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    return F.size(
        F.filter(tokens(text), lambda x: x.isin(*stopwords))
    ).cast("bigint")


def quality_metrics(text: Column) -> dict[str, Column]:
    """Length/stopword/token-shape quality signals.

    Returns integer-scaled metrics: stopword ratio in basis points,
    mean token length in milli-chars.
    """
    toks = tokens(text)
    n_tok = F.size(toks).cast("bigint")
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS))).cast("bigint")
    tok_chars = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda acc, x: acc + x
    ).cast("bigint")
    stop_ratio_bp = F.floor(
        F.lit(10000.0) * n_stop.cast("double") / n_tok.cast("double")
    ).cast("bigint")
    mean_token_len_e3 = F.floor(
        F.lit(1000.0) * tok_chars.cast("double") / n_tok.cast("double")
    ).cast("bigint")
    return {
        "n_tokens": n_tok,
        "n_stopwords": n_stop,
        "token_chars": tok_chars,
        "stop_ratio_bp": stop_ratio_bp,
        "mean_token_len_e3": mean_token_len_e3,
    }


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-family hit counts (n-gram heuristic)."""
    lowered = F.lower(text)
    return {
        name: F.regexp_count(lowered, F.lit(pat)).cast("int")
        for name, pat in LANG_VOCAB.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language label with a fixed priority tie-break."""
    s = lang_scores(text)
    a, r, p = s["article"], s["relational"], s["perf"]
    return (
        F.when((a >= r) & (a >= p), F.lit("article"))
        .when(r >= p, F.lit("relational"))
        .otherwise(F.lit("perf"))
    )


# CP1252-decoded-as-UTF8 mojibake shapes ('â€™', 'Ã©', 'Â ', …): the
# classic double-encoding fingerprint a web-crawl corpus carries.
MOJIBAKE_RE = "(â€.|Ã.|Â )"
CONTROL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"


def encoding_metrics(text: Column) -> dict[str, Column]:
    """Byte/char-level encoding health signals: UTF-8 byte overhead
    (non-ASCII mass), control characters, U+FFFD replacement chars (a
    decoder already gave up upstream), CP1252-mojibake pattern hits, and
    whitespace share — the route/quarantine/fix-encoding decision a
    crawl-scale ingest makes per document BEFORE any language or quality
    model sees it. All integer-valued column expressions over one scan;
    counts via single-char regex classes so Spark and SQL engines agree
    exactly."""
    n_chars = F.length(text).cast("bigint")
    n_bytes = F.octet_length(F.encode(text, "UTF-8")).cast("bigint")
    n_ctrl = F.regexp_count(text, F.lit(CONTROL_RE)).cast("bigint")
    n_repl = F.regexp_count(text, F.lit("�")).cast("bigint")
    n_moji = F.regexp_count(text, F.lit(MOJIBAKE_RE)).cast("bigint")
    n_ws = (n_chars - F.length(F.regexp_replace(text, "[ \\t\\n\\r]", ""))).cast(
        "bigint"
    )
    ws_bp = (
        F.when(
            n_chars > 0,
            F.floor(F.lit(10000.0) * n_ws.cast("double") / n_chars.cast("double")),
        )
        .otherwise(F.lit(0))
        .cast("bigint")
    )
    return {
        "n_chars": n_chars,
        "n_bytes": n_bytes,
        "non_ascii_bytes": (n_bytes - n_chars).cast("bigint"),
        "n_control": n_ctrl,
        "n_replacement": n_repl,
        "n_mojibake": n_moji,
        "ws_bp": ws_bp,
    }


def redact_terms(text: Column, pattern: str, replacement: str = "<TERM>") -> dict[str, Column]:
    """Denylist scrubbing / PII-style redaction: replace every match of
    ``pattern`` and count what was removed (the audit trail a compliance
    pass needs). Pure regexp column expressions — a redacted scan is
    still a scan. The pattern must stay in the RE2-compatible subset so
    the same semantics hold on any engine (no backrefs, no lookaround)."""
    lowered = F.lower(text)
    return {
        "redacted": F.regexp_replace(lowered, pattern, replacement),
        "n_redacted": F.regexp_count(lowered, F.lit(pattern)).cast("bigint"),
    }


def normalize_text(text: Column) -> Column:
    """Lowercase + whitespace collapse, the canonical form for hashing."""
    return F.regexp_replace(F.lower(text), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    md5 (not Spark's murmur3 ``hash``) so fingerprints are portable across
    engines and stable across Spark versions.
    """
    return F.md5(normalize_text(text))


# Unicode web-text folding map: typographic punctuation a crawl emits ->
# the ASCII the tokenizer/dedup layer expects. translate() is a
# codepoint-for-codepoint map (JVM-side, no regex engine), so it handles
# every 1:1 fold; the 1:N folds (ellipsis) go through regexp_replace
# afterwards. Escapes, not literals: invisible characters in source are
# unreviewable.
_FOLD_SRC = (
    "\u2018\u2019\u201a\u201b"   # single quotes
    "\u201c\u201d\u201e"          # double quotes
    "\u2013\u2014\u2212"          # en/em dash, minus sign
    "\u00a0\u2009\u202f\u3000"   # nbsp, thin/narrow-nbsp, ideographic space
)
_FOLD_DST = '\'\'\'\'"""---    '
# zero-width chars / joiners / BOM / soft hyphen: delete outright
# (translate drops source chars with no destination counterpart)
_ZERO_WIDTH = "\u200b\u200c\u200d\u2060\ufeff\u00ad"


def normalize_web_text(text: Column) -> Column:
    """Crawl-grade text normalization, entirely JVM column arithmetic:

    1. fold typographic quotes/dashes and exotic spaces to ASCII
       (codepoint map via ``translate`` — no regex engine involved),
    2. delete zero-width characters, BOM, and soft hyphens,
    3. expand ellipsis to ``...``,
    4. collapse whitespace runs and trim.

    This is the pass a dedup/tokenizer layer wants BEFORE fingerprinting:
    two crawls of the same page differing only in typography and
    invisible characters normalize to identical strings. Case is
    preserved — callers compose with lower()/fingerprint() as needed
    (normalize_text stays the hashing canonicalizer).
    """
    folded = F.translate(text, _FOLD_SRC + _ZERO_WIDTH, _FOLD_DST)
    expanded = F.regexp_replace(folded, "\u2026", "...")
    return F.trim(F.regexp_replace(expanded, r"\s+", " "))
