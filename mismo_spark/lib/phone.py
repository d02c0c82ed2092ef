"""Phone number cleaning.

Semantics of mismo/lib/phone/_core.py:31-82 — all pure column algebra.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


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
