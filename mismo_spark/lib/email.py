"""Email cleaning / parsing / match levels.

Semantics of mismo/lib/email/_core.py:16-133 — pure column algebra
except the near-match edit distance (Arrow pandas UDF via
text.damerau_levenshtein).
"""

from __future__ import annotations

from enum import IntEnum

from pyspark.sql import Column
from pyspark.sql import functions as F

from mismo_spark.text.similarity import damerau_levenshtein


def clean_email(email: Column, *, normalize: bool = False) -> Column:
    """lower → extract r'(\\S+@\\S+)' → nullif '' ; normalize also strips
    '.' and '_' (mismo/lib/email/_core.py:16-30)."""
    out = F.nullif(F.regexp_extract(F.lower(email), r"(\S+@\S+)", 1), F.lit(""))
    if normalize:
        out = F.translate(out, "._", "")
    return out


def parse_email(full: Column) -> Column:
    """→ struct<full, user, domain> (mismo/lib/email/_core.py:33-70)."""
    parts = F.split(full, "@")
    user = F.nullif(parts.getItem(0), F.lit(""))
    domain = F.nullif(parts.getItem(1), F.lit(""))
    return F.struct(full.alias("full"), user.alias("user"), domain.alias("domain"))


class EmailMatchLevel(IntEnum):
    """mismo/lib/email/_core.py:73-90."""

    FULL_EXACT = 0
    FULL_NEAR = 1
    USER_EXACT = 2
    USER_NEAR = 3
    ELSE = 4


def match_level(e1: Column, e2: Column) -> Column:
    """FULL_EXACT < FULL_NEAR (DL≤1) < USER_EXACT < USER_NEAR < ELSE over
    normalized, parsed addresses (mismo/lib/email/_core.py:93-133).
    Inputs are raw string columns."""
    p1 = parse_email(clean_email(e1, normalize=True))
    p2 = parse_email(clean_email(e2, normalize=True))
    return (
        F.when(p1["full"] == p2["full"], F.lit(int(EmailMatchLevel.FULL_EXACT)))
        .when(
            damerau_levenshtein(p1["full"], p2["full"]) <= 1,
            F.lit(int(EmailMatchLevel.FULL_NEAR)),
        )
        .when(p1["user"] == p2["user"], F.lit(int(EmailMatchLevel.USER_EXACT)))
        .when(
            damerau_levenshtein(p1["user"], p2["user"]) <= 1,
            F.lit(int(EmailMatchLevel.USER_NEAR)),
        )
        .otherwise(F.lit(int(EmailMatchLevel.ELSE)))
    )
