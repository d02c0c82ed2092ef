"""C4-style line cleaning + PII redaction (Raffel et al. 2020 §2.2's
heuristics; beyond the reference — the pre-tokenization scrub every
web-text pipeline runs before dedup/quality stages).

All pure column algebra (regexp + array HOFs, zero UDFs, map-only
plans), with patterns kept in the RE2 ∩ java.util.regex common subset
(no lookbehind/backreferences) so the DuckDB oracle replays them
verbatim.

``c4_clean_lines`` keeps a line iff it
* ends in terminal punctuation (. ! ? ")
* has at least ``min_words`` whitespace words, and
* is not cookie/javascript boilerplate (case-insensitive substring:
  "javascript", "cookie", "terms of use", "privacy policy")
and returns the kept lines re-joined with '\\n' (NULL text → NULL).

``c4_doc_flags`` marks whole-document C4 drop conditions: a "lorem
ipsum" occurrence or a curly brace (code) anywhere.

``redact_pii`` masks emails, +-prefixed/phone-shaped number runs and
IPv4 addresses with fixed placeholder tokens — deterministic,
idempotent (the placeholders don't re-match the patterns).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TERMINAL_RE = r'[.!?"]\s*$'
BOILER_RE = r"(?i)(javascript|cookie|terms of use|privacy policy)"
LOREM_RE = r"(?i)lorem ipsum"
EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\-() ]{7,}\d"


def c4_clean_lines(text: Column, *, min_words: int = 3) -> Column:
    """Filtered-and-rejoined text per the C4 line rules."""
    kept = F.filter(
        F.split(text, "\n"),
        lambda l: l.rlike(TERMINAL_RE)
        & (F.size(F.split(F.trim(l), r"\s+")) >= min_words)
        & ~l.rlike(BOILER_RE),
    )
    return F.when(text.isNull(), F.lit(None).cast("string")).otherwise(
        F.array_join(kept, "\n")
    )


def c4_doc_flags(text: Column) -> Column:
    """struct<has_lorem_ipsum, has_curly_brace> — C4 whole-doc drops."""
    return F.struct(
        text.rlike(LOREM_RE).alias("has_lorem_ipsum"),
        text.contains("{").alias("has_curly_brace"),
    )


def redact_pii(text: Column) -> Column:
    """Emails → <EMAIL>, IPv4 → <IP>, phone-shaped runs → <PHONE>.
    Order matters: emails first (their digits must not be eaten by the
    phone rule), then IPs (dot-separated digits would otherwise match
    the phone run), then phones."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out
