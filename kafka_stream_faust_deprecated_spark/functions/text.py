"""Text primitives for dedup and text analysis (SURVEY.md §2b E23, E25).

All pure column expressions — they compile into whole-stage codegen, no
Python in the hot path. Cross-engine determinism rule: every hash used
for signatures is built from ``md5`` hex strings, which Spark and DuckDB
compute identically, so even the MinHash/SimHash pipelines are
oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Tiny multilingual stopword lexicons — the cheap, deterministic
#: language-ID heuristic (score = lexicon-hit count per language).
LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that"),
    "es": ("el", "la", "de", "los", "las", "que", "una", "por"),
    "fr": ("le", "les", "des", "une", "est", "dans", "pour", "avec"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
}

#: English stopwords used by the quality score (subset big enough to
#: produce a meaningful ratio on real text).
STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "of", "and", "or", "to", "in", "on", "is", "are",
    "was", "be", "that", "this", "it", "as", "for", "with", "at", "by",
)


def norm_text(col: Column) -> Column:
    """Lowercase, trim, collapse runs of whitespace — the canonical form
    every dedup/fingerprint operator keys on."""
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


def tokens(col: Column) -> Column:
    """Whitespace tokens of the normalized text."""
    return F.split(norm_text(col), " ")


def word_shingles(toks: Column, n: int = 3) -> Column:
    """n-word shingles as space-joined strings; empty array when the doc
    has fewer than ``n`` tokens (DuckDB's ``range`` does the same)."""
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))


def hex4_to_long(hex4: Column) -> Column:
    """First-4-hex-chars -> 16-bit integer (for SimHash bit sampling)."""
    return F.conv(hex4, 16, 10).cast("long")


def token_hash16(tok: Column) -> Column:
    """Deterministic 16-bit hash of a token via md5 — identical in DuckDB
    as ``strpos``-decoded ``substr(md5(t),1,4)``."""
    return hex4_to_long(F.substring(F.md5(tok), 1, 4))


def stopword_ratio(toks: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    """Fraction of tokens that are stopwords (0 when the doc is empty)."""
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def type_token_ratio(toks: Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens."""
    return F.when(
        F.size(toks) > 0, F.size(F.array_distinct(toks)) / F.size(toks)
    ).otherwise(F.lit(0.0))
