"""Phone number cleaning and match levels.

Semantics of mismo/lib/phone/_core.py:31-180 — all pure column algebra
except the near-match edit distance (Arrow pandas UDF).
"""

from __future__ import annotations

from enum import IntEnum

from pyspark.sql import Column
from pyspark.sql import functions as F


class PhoneMatchLevel(IntEnum):
    """mismo/lib/phone/_core.py:85-94."""

    EXACT = 0
    NEAR = 1
    ELSE = 2


def match_level(p1: Column, p2: Column) -> Column:
    """EXACT < NEAR (DL≤1) < ELSE over already-cleaned numbers
    (mismo/lib/phone/_core.py:97-130)."""
    from mismo_spark.text.similarity import damerau_levenshtein

    return (
        F.when(p1 == p2, F.lit(int(PhoneMatchLevel.EXACT)))
        .when(damerau_levenshtein(p1, p2) <= 1, F.lit(int(PhoneMatchLevel.NEAR)))
        .otherwise(F.lit(int(PhoneMatchLevel.ELSE)))
    )


def clean_phone_number(
    phone: Column, *, default_area_code: str | None = None
) -> Column:
    """digits-only → optional area-code prefix for 7-digit numbers →
    extract 10 digits after optional leading 1 → null for '' and bogus
    patterns 0000/9999/12345 (mismo/lib/phone/_core.py:31-82)."""
    x = F.regexp_replace(phone.cast("string"), r"[^0-9]", "")
    if default_area_code is not None:
        if len(default_area_code) != 3:
            raise ValueError("default_area_code must be 3 digits")
        x = F.regexp_replace(x, r"^(\d{7})$", default_area_code + r"$1")
    x = F.nullif(F.regexp_extract(x, r"1?(\d{10})", 1), F.lit(""))
    is_bogus = x.rlike(".*(0000|9999|12345).*")
    return F.when(is_bogus, F.lit(None).cast("string")).otherwise(x)
