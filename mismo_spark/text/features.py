"""Tokenization and n-grams — pure column expressions.

Semantics of mismo/text/_features.py:9-79.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokenize(c: Column) -> Column:
    """Whitespace split; "" and all-space → []; null → null
    (mismo/text/_features.py:9-27).

    Implementation note: Catalyst's StringSplit recompiles a regex
    Pattern on EVERY call (java String.split has no cache), which
    dominated profile time on long documents.  RegExpReplace, by
    contrast, caches its compiled pattern per expression instance — so
    collapse whitespace runs with one cached regex, then split on a
    literal single space, which takes String.split's no-regex fast
    path.  Token output is identical."""
    trimmed = F.trim(c)
    collapsed = F.regexp_replace(trimmed, r"\s+", " ")
    return F.when(c.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
            F.split(collapsed, " ")
        )
    )


def ngrams(c: Column, n: int) -> Column:
    """Character n-grams, order not guaranteed, may contain duplicates
    (mismo/text/_features.py:31-79).  Expressed as
    sequence(1, len−n+1) → transform(substring) — higher-order functions,
    no UDF, no explode (stays one row per input).

    Strings shorter than n → []; null → null.
    """
    length = F.length(c)
    idx = F.sequence(F.lit(1), length - F.lit(n - 1))
    grams = F.transform(idx, lambda i: c.substr(i, F.lit(n)))
    return F.when(c.isNull(), F.lit(None).cast("array<string>")).otherwise(
        F.when(length < n, F.array().cast("array<string>")).otherwise(grams)
    )
