"""Gopher quality rules (Rae et al. 2021, §A1.1) as a per-document
boolean struct — the rule set every large web-text pipeline screens
with, next to ``quality_score``'s single scalar.  Pure column algebra
(map-only); each threshold replayed verbatim by the DuckDB oracle.

Accounting contract:
* words = whitespace tokens of the trimmed text (tokenize semantics);
* mean word length = mean of ``length(word)`` over words;
* symbol ratio = (# of '#' and '…'/'...' occurrences) / word count;
* bullet/ellipsis line fractions are over non-blank lines, matching
  ``textqa.repetition``'s line accounting;
* alpha-word fraction = words containing ≥1 ASCII letter / words;
* stopword rule: ≥ 2 distinct hits among {the, be, to, of, and, that,
  have, with}.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    text: Column,
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
) -> Column:
    """struct of per-rule booleans + ``passes`` (AND of all rules)."""
    toks = F.filter(
        F.split(F.trim(text), r"\s+"), lambda w: w != ""
    )
    n_words = F.size(toks)
    safe_words = F.greatest(n_words, F.lit(1)).cast("double")
    mean_len = F.aggregate(
        toks, F.lit(0), lambda acc, w: acc + F.length(w)
    ).cast("double") / safe_words
    n_hash = F.length(text) - F.length(F.regexp_replace(text, r"#", ""))
    n_ellipsis = F.size(F.split(text, r"(\.\.\.|…)")) - 1
    symbol_ratio = (n_hash + n_ellipsis).cast("double") / safe_words
    lines = F.filter(F.split(text, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_frac = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([\*•-])"))
    ).cast("double") / n_lines
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$"))
    ).cast("double") / n_lines
    alpha_frac = F.size(
        F.filter(toks, lambda w: w.rlike(r"[A-Za-z]"))
    ).cast("double") / safe_words
    stop_hits = F.size(
        F.array_intersect(
            F.array_distinct(F.transform(toks, lambda w: F.lower(w))),
            F.array(*[F.lit(w) for w in GOPHER_STOPWORDS]),
        )
    )
    rules = {
        "word_count_ok": (n_words >= min_words) & (n_words <= max_words),
        "mean_word_len_ok": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "symbol_ratio_ok": symbol_ratio <= max_symbol_ratio,
        "bullet_frac_ok": bullet_frac <= max_bullet_frac,
        "ellipsis_frac_ok": ellipsis_frac <= max_ellipsis_frac,
        "alpha_frac_ok": alpha_frac >= min_alpha_frac,
        "stopwords_ok": stop_hits >= min_stopword_hits,
    }
    passes = None
    for c in rules.values():
        passes = c if passes is None else (passes & c)
    return F.struct(
        *[c.alias(name) for name, c in rules.items()], passes.alias("passes")
    )
