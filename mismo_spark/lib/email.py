"""Email cleaning / parsing / match levels / EmailsDimension.

Semantics of mismo/lib/email/_core.py:16-212 — pure column algebra
except the near-match edit distance (Arrow pandas UDF via
text.damerau_levenshtein).
"""

from __future__ import annotations

from enum import IntEnum

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from mismo_spark.text.similarity import _damerau_levenshtein, damerau_levenshtein


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


class ParsedEmail:
    """An email split into parts, as three Column attributes
    (mismo/lib/email/_core.py:33-70).  No cleaning — compose with
    :func:`clean_email` first, exactly like the reference."""

    def __init__(self, full: Column, /) -> None:
        parts = F.split(full, "@")
        self.full = full
        self.user = F.nullif(parts.getItem(0), F.lit(""))
        self.domain = F.nullif(parts.getItem(1), F.lit(""))

    def as_struct(self) -> Column:
        """→ struct<full, user, domain>
        (mismo/lib/email/_core.py:57-70)."""
        return F.struct(
            self.full.alias("full"),
            self.user.alias("user"),
            self.domain.alias("domain"),
        )


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


# -- EmailsDimension (mismo/lib/email/_core.py:136-212) -------------------


def _email_pair_level(f1, u1, f2, u2) -> int:
    """Python mirror of match_level for one parsed pair (executed inside
    the Arrow batch of EmailsDimension.compare)."""
    if f1 is not None and f1 == f2:
        return int(EmailMatchLevel.FULL_EXACT)
    if f1 is not None and f2 is not None and _damerau_levenshtein(f1, f2) <= 1:
        return int(EmailMatchLevel.FULL_NEAR)
    if u1 is not None and u1 == u2:
        return int(EmailMatchLevel.USER_EXACT)
    if u1 is not None and u2 is not None and _damerau_levenshtein(u1, u2) <= 1:
        return int(EmailMatchLevel.USER_NEAR)
    return int(EmailMatchLevel.ELSE)


@F.pandas_udf(LongType())
def _best_email_level_udf(left: pd.Series, right: pd.Series) -> pd.Series:
    """Best (min) match level across all l×r combinations of two parsed
    email arrays.  One Arrow stage, NO shuffle — the reference maps
    match_level over array_combinations (mismo/lib/email/_core.py:185-192);
    a higher-order-function translation is impossible because the level
    needs an edit-distance UDF, and explode→re-aggregate would add two
    shuffles per compare.  Arrays are per-record email lists (tiny), so
    the in-batch double loop is bounded."""
    out = []
    for le, ri in zip(left, right):
        if le is None or ri is None or len(le) == 0 or len(ri) == 0:
            out.append(int(EmailMatchLevel.ELSE))
            continue
        best = int(EmailMatchLevel.ELSE)
        for e1 in le:
            for e2 in ri:
                lvl = _email_pair_level(
                    e1["full"], e1["user"], e2["full"], e2["user"]
                )
                if lvl < best:
                    best = lvl
                    if best == 0:
                        break
            if best == 0:
                break
        out.append(best)
    return pd.Series(out)


class EmailsDimension:
    """Prep + block + compare bundle over an array<string> email column
    (mismo/lib/email/_core.py:136-212)."""

    def __init__(
        self,
        column: str,
        *,
        column_parsed: str = "{column}_parsed",
        column_compared: str = "{column}_compared",
    ) -> None:
        self.column = column
        self.column_parsed = column_parsed.format(column=column)
        self.column_compared = column_compared.format(column=column)

    def prepare(self, t: DataFrame) -> DataFrame:
        """array<string> → array<struct<full,user,domain>> via a
        higher-order transform (pure column algebra, codegen'd)
        (mismo/lib/email/_core.py:165-176)."""
        return t.withColumn(
            self.column_parsed,
            F.filter(
                F.transform(
                    F.col(self.column),
                    lambda e: parse_email(clean_email(e, normalize=True)),
                ),
                lambda p: p["full"].isNotNull(),
            ),
        )

    def block(self, left: DataFrame, right: DataFrame | None = None, **kwargs):
        """UnnestLinker on the normalized full address
        (mismo/lib/email/_core.py:180-182)."""
        from mismo_spark.linker.unnest import UnnestLinker

        linker = UnnestLinker(
            F.transform(F.col(self.column_parsed), lambda p: p["full"]), **kwargs
        )
        return linker(left, right)

    def compare(self, t: DataFrame) -> DataFrame:
        """Add the best match level across all pairs of addresses
        (mismo/lib/email/_core.py:185-192)."""
        return t.withColumn(
            self.column_compared,
            _best_email_level_udf(
                F.col(self.column_parsed + "_l"), F.col(self.column_parsed + "_r")
            ),
        )
