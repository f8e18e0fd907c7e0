"""Text-analysis functions for the training-data pipeline extension
(BASELINE.json north star): tokenization, token counting, quality scoring,
language ID, document fingerprinting.

All pure Catalyst expressions (split/regexp/aggregate HOFs) — no UDFs, so
they run JVM-side inside whole-stage codegen and scale linearly with
partitions. Each helper has a `*_SQL` twin producing the equivalent ANSI
SQL (DuckDB dialect) from the same constants, so the driver oracle can
never drift from the Spark implementation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# shared constants -----------------------------------------------------------

STOPWORDS = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# languages scored by stopword-set hits; tie → first in this order
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in"),
    "es": ("el", "la", "de", "que", "y", "en"),
    "fr": ("le", "la", "de", "et", "un", "en"),
    "de": ("der", "die", "und", "das", "ein", "zu"),
}

PUNCT_RE = "[^a-zA-Z0-9 ]"


# tokenization ---------------------------------------------------------------

def tokens(col: str | Column) -> Column:
    """Whitespace tokenization of trimmed text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def TOKENS_SQL(col: str) -> str:
    return f"string_split_regex(trim({col}), '\\s+')"


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def TOKEN_COUNT_SQL(col: str) -> str:
    return f"len({TOKENS_SQL(col)})"


def bpe_ish_token_count(col: str | Column) -> Column:
    """BPE-ish proxy: alpha runs, digit runs, and single punct marks each
    count as one token (regexp-count; the standard pre-tokenizer shape)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def BPE_ISH_TOKEN_COUNT_SQL(col: str) -> str:
    return f"len(regexp_extract_all({col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))"


# quality scoring ------------------------------------------------------------

def punct_ratio(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PUNCT_RE)) / F.greatest(F.length(c), F.lit(1))


def PUNCT_RATIO_SQL(col: str) -> str:
    return (
        f"len(regexp_extract_all({col}, '{PUNCT_RE}'))"
        f" / greatest(length({col}), 1)"
    )


def stopword_ratio(col: str | Column) -> Column:
    toks = tokens(col)
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def STOPWORD_RATIO_SQL(col: str) -> str:
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"len(list_filter({TOKENS_SQL(col)}, t -> list_contains([{in_list}], lower(t))))"
        f" / greatest(len({TOKENS_SQL(col)}), 1)"
    )


def stopword_hits(col: str | Column) -> Column:
    """Exact stopword-hit COUNT (the ratio's integer numerator) — summable
    across docs without float order-dependence, for corpus/source-level
    profiles."""
    return F.size(F.filter(tokens(col), lambda t: F.lower(t).isin(*STOPWORDS)))


def STOPWORD_HITS_SQL(col: str) -> str:
    in_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return (
        f"len(list_filter({TOKENS_SQL(col)}, t -> list_contains([{in_list}], lower(t))))"
    )


# language ID ----------------------------------------------------------------

def _in_set(words: tuple[str, ...]):
    # factory (not lambda default-args): Spark HOFs dispatch on lambda arity
    return lambda t: F.lower(t).isin(*words)


def lang_scores(col: str | Column) -> dict[str, Column]:
    toks = tokens(col)
    return {
        lang: F.size(F.filter(toks, _in_set(sw)))
        for lang, sw in LANG_STOPWORDS.items()
    }


def lang_id(col: str | Column) -> Column:
    """Argmax of stopword hits; 'und' (undetermined) when all scores are 0.
    Ties break by LANG_STOPWORDS declaration order."""
    scores = lang_scores(col)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    # iterate reversed so earlier languages win ties
    for lang in reversed(list(scores)):
        s = scores[lang]
        best_lang = F.when(s >= F.greatest(best_score, F.lit(1)), F.lit(lang)).otherwise(best_lang)
        best_score = F.greatest(best_score, s)
    return best_lang


def LANG_ID_SQL(col: str) -> str:
    def score(sw):
        in_list = ", ".join(f"'{w}'" for w in sw)
        return f"len(list_filter({TOKENS_SQL(col)}, t -> list_contains([{in_list}], lower(t))))"

    expr = "'und'"
    prev_scores: list[str] = []
    for lang in reversed(list(LANG_STOPWORDS)):
        s = score(LANG_STOPWORDS[lang])
        later = [score(LANG_STOPWORDS[x]) for x in prev_scores]
        floor = f"greatest({', '.join(later + ['0'])}, 0)" if later else "0"
        expr = f"CASE WHEN {s} >= greatest({floor}, 1) THEN '{lang}' ELSE {expr} END"
        prev_scores.append(lang)
    return expr


# fingerprinting -------------------------------------------------------------

def normalize_text(col: str | Column) -> Column:
    """lower + collapse whitespace — canonical form for exact dedup."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def NORMALIZE_TEXT_SQL(col: str) -> str:
    return f"regexp_replace(lower(trim({col})), '\\s+', ' ', 'g')"


def fingerprint(col: str | Column) -> Column:
    """Deterministic 128-bit content fingerprint (md5 of normalized text).
    md5 hex output is identical in Spark and DuckDB."""
    return F.md5(normalize_text(col))


def FINGERPRINT_SQL(col: str) -> str:
    return f"md5({NORMALIZE_TEXT_SQL(col)})"


# token n-grams --------------------------------------------------------------

def ngrams(col: str | Column, n: int) -> Column:
    """Token n-grams as space-joined strings; empty array when the document
    has fewer than ``n`` tokens (sequence() would count DOWN for a negative
    span, so the guard is explicit)."""
    toks = tokens(col)
    cnt = F.size(toks) - F.lit(n - 1)
    return F.when(
        cnt >= 1,
        F.transform(
            F.sequence(F.lit(1), cnt),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def NGRAMS_SQL(col: str, n: int) -> str:
    toks = TOKENS_SQL(col)
    return (
        f"CASE WHEN len({toks}) >= {n} THEN "
        f"list_transform(range(1, len({toks}) - {n} + 2), "
        f"i -> array_to_string(({toks})[i:i+{n - 1}], ' ')) "
        f"ELSE CAST([] AS VARCHAR[]) END"
    )


# PII-ish pattern counts -----------------------------------------------------
# RE2-compatible patterns (no backrefs/lookaround) so Spark's Java regex and
# DuckDB's RE2 agree on every match.

PII_PATTERNS: dict[str, str] = {
    "n_emails": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "n_phones": r"\+?[0-9][0-9() -]{7,}[0-9]",
    "n_ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    "n_urls": r"https?://[^ ]+",
}


def pii_counts(col: str | Column) -> dict[str, Column]:
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(c, F.lit(pat)) for name, pat in PII_PATTERNS.items()
    }


def PII_COUNTS_SQL(col: str) -> dict[str, str]:
    return {
        name: f"len(regexp_extract_all({col}, '{pat}'))"
        for name, pat in PII_PATTERNS.items()
    }
