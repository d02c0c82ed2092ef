"""Text analysis for large-scale training-data pipelines.

Not in the reference (mismo is record linkage), but first-class here:
language ID (n-gram heuristic), quality scoring, token counting, and
document fingerprinting — all pure column algebra over the documents
table, no UDFs, fully pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mismo_spark._util import explode_computed

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


def line_lang_fractions(
    docs,
    *,
    id_col: str = "record_id",
    text_col: str = "text",
    min_fraction: float = 0.2,
):
    """→ DataFrame(id_col, n_lines, frac_en, frac_es, frac_de, frac_fr,
    frac_und, dominant_lang, is_multilingual): per-document language
    COMPOSITION from line-level ``lang_id`` — the multilingual-page
    handler a document-level guess can't provide (a page that is 60%
    English boilerplate and 40% German content gets one doc-level
    label; per-line fractions expose the mix so curation can split,
    keep or drop it deliberately).

    ``dominant_lang`` ties resolve in the fixed marker order
    (en, es, de, fr, und); ``is_multilingual`` is true when ≥ 2 real
    languages (not 'und') each hold ≥ ``min_fraction`` of the lines.
    Documents with no non-empty lines get n_lines 0, zero fractions,
    dominant 'und'.

    Plan: one explode over lines, per-line ``lang_id`` (pure column
    algebra inside the generator), ONE groupBy(id) of conditional sums
    (map-side combine) — no second corpus pass, no UDF."""
    langs = list(_LANG_MARKERS)
    lines = explode_computed(
        docs, [F.col(id_col).alias("__id")], F.split(F.col(text_col), "\n"), "__line"
    ).where(F.trim(F.col("__line")) != "")
    tagged = lines.select("__id", lang_id(F.col("__line")).alias("__l"))
    counts = tagged.groupBy("__id").agg(
        F.count(F.lit(1)).alias("n_lines"),
        *[
            F.sum((F.col("__l") == lang).cast("long")).alias(f"__c_{lang}")
            for lang in langs + ["und"]
        ],
    )
    n = F.col("n_lines")
    best = F.greatest(*[F.col(f"__c_{lang}") for lang in langs + ["und"]])
    dom = F.lit("und")
    for lang in reversed(langs + ["und"]):
        dom = F.when(F.col(f"__c_{lang}") == best, F.lit(lang)).otherwise(dom)
    n_real = sum(
        (
            (F.col(f"__c_{lang}") / n) >= F.lit(float(min_fraction))
        ).cast("int")
        for lang in langs
    )
    out = counts.select(
        F.col("__id").alias(id_col),
        "n_lines",
        *[
            F.round(F.col(f"__c_{lang}") / n, 6).alias(f"frac_{lang}")
            for lang in langs + ["und"]
        ],
        dom.alias("dominant_lang"),
        (n_real >= 2).alias("is_multilingual"),
    )
    base = docs.select(F.col(id_col))
    return base.join(out, id_col, "left").select(
        id_col,
        F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
        *[
            F.coalesce(f"frac_{lang}", F.lit(0.0)).alias(f"frac_{lang}")
            for lang in langs + ["und"]
        ],
        F.coalesce("dominant_lang", F.lit("und")).alias("dominant_lang"),
        F.coalesce("is_multilingual", F.lit(False)).alias("is_multilingual"),
    )
