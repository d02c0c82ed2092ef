"""Text analysis for large-scale training-data pipelines.

Not in the reference (mismo is record linkage), but first-class here:
language ID (n-gram heuristic), quality scoring, token counting, and
document fingerprinting — all pure column algebra over the documents
table, no UDFs, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword marker sets for the n-gram/stopword
# language heuristic — deliberately small and deterministic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "como"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "que"],
}


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/null-safe."""
    t = F.trim(text)
    return F.when(text.isNull(), F.lit(None).cast("long")).otherwise(
        F.when(t == "", F.lit(0).cast("long")).otherwise(
            F.size(F.split(t, r"\s+")).cast("long")
        )
    )


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: words + digits + punctuation marks
    counted separately (a cheap, deterministic BPE proxy)."""
    pieces = F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"), 0
    )
    return F.when(text.isNull(), F.lit(None).cast("long")).otherwise(
        F.size(pieces).cast("long")
    )


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: mean word length sanity, punctuation
    ratio, stopword presence, uppercase ratio.  All JVM-side."""
    n_chars = F.length(text)
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    n_toks = F.size(toks)
    mean_wordlen = n_chars.cast("double") / F.greatest(n_toks, F.lit(1)).cast("double")
    punct = F.length(F.regexp_replace(text, r"[^!?.,;:]", ""))
    punct_ratio = punct.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    upper = F.length(F.regexp_replace(text, r"[^A-Z]", ""))
    upper_ratio = upper.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    stop = F.array([F.lit(w) for w in _LANG_MARKERS["en"]])
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), stop))
    stop_score = F.least(stop_hits.cast("double") / F.lit(3.0), F.lit(1.0))
    wordlen_score = F.when(
        (mean_wordlen >= 3.0) & (mean_wordlen <= 12.0), F.lit(1.0)
    ).otherwise(F.lit(0.0))
    punct_score = F.when(punct_ratio <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    upper_score = F.when(upper_ratio <= 0.3, F.lit(1.0)).otherwise(F.lit(0.0))
    return (
        wordlen_score * 0.3 + punct_score * 0.2 + upper_score * 0.2 + stop_score * 0.3
    )


def lang_id(text: Column) -> Column:
    """Stopword-marker language guess over {en, es, de, fr}, 'und'
    (undetermined) when nothing matches.  First-match-wins on the
    highest marker count."""
    toks = F.array_distinct(F.split(F.trim(F.lower(text)), r"\s+"))
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array([F.lit(w) for w in words]))
        )
        for lang, words in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    out = F.when(best <= 0, F.lit("und"))
    for lang in _LANG_MARKERS:
        out = out.when(scores[lang] == best, F.lit(lang))
    return out.otherwise(F.lit("und"))


def fingerprint(text: Column, *, normalize: bool = True) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the
    whitespace-normalized, lowercased text.  The exact-dedup key."""
    t = text
    if normalize:
        t = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.xxhash64(t)


def fingerprint_hex(text: Column, *, normalize: bool = True) -> Column:
    """md5 hex variant (cross-engine comparable — DuckDB has md5)."""
    t = text
    if normalize:
        t = F.lower(F.regexp_replace(F.trim(text), r"\s+", " "))
    return F.md5(t)
