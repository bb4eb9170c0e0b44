"""Text-analysis column builders for large-scale corpus processing.

All pure JVM built-ins / higher-order functions (whole-stage codegen, no
Python UDFs) so they hold up on a 100 TB corpus: language-ID by marker-word
counting, quality scoring (length/punct/stopword ratios), token counting,
and order-insensitive document fingerprinting.

These are net-new capability beyond the reference (BASELINE.json north
star); the reference's own scalar surface is covered in bq_compat.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small inline marker lists — deterministic and easily mirrored in the
# DuckDB oracle. Real deployments would broadcast a proper lexicon table.
STOPWORDS = ("the", "a", "of", "and", "is", "to", "in")
LANG_MARKERS = {
    "en": ("the", "and", "of", "a"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (single-space split, matching the oracle)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(toks: Column) -> Column:
    return F.size(toks)


def _count_in(toks: Column, words: tuple[str, ...]) -> Column:
    """Occurrences of any of ``words`` in the token array (HOF filter)."""
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_count(toks: Column) -> Column:
    return _count_in(toks, STOPWORDS)


def lang_scores(toks: Column) -> dict[str, Column]:
    return {lang: _count_in(toks, markers) for lang, markers in LANG_MARKERS.items()}


def lang_predict(en: Column, es: Column, de: Column) -> Column:
    """Argmax with fixed priority tie-break (en > es > de), 'und' if no
    marker hits at all — deterministic, oracle-mirrorable."""
    return (
        F.when((en >= es) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= de) & (es > 0), F.lit("es"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def punct_count(text: Column) -> Column:
    """Characters outside [a-z0-9 ] (lower-cased corpus): strip the
    alphanumerics/spaces and count what remains."""
    return F.length(F.regexp_replace(text, "[a-z0-9 ]", ""))


def fingerprint(toks: Column) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set. Equal for permuted documents; the scale path for clustering
    re-shuffled boilerplate."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " "))
