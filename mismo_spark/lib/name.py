"""Person-name normalization and comparison helpers.

Semantics of mismo/lib/name/_clean.py:11-79 and
mismo/lib/name/_nicknames.py:68-125 (nickname data reduced to a small
built-in sample; real deployments would broadcast a full table).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark.text.strings import strip_accents

# tiny deterministic sample of the nickname pair data
# (mismo/lib/name/_nicknames.py ships a large CSV; same join semantics)
_NICKNAME_PAIRS = [
    ("WILLIAM", "BILL"),
    ("WILLIAM", "WILL"),
    ("ROBERT", "BOB"),
    ("ROBERT", "ROB"),
    ("RICHARD", "DICK"),
    ("RICHARD", "RICK"),
    ("MARGARET", "PEGGY"),
    ("MARGARET", "MEG"),
    ("ELIZABETH", "BETH"),
    ("ELIZABETH", "LIZ"),
    ("JAMES", "JIM"),
    ("JOHN", "JACK"),
    ("KATHERINE", "KATE"),
    ("MICHAEL", "MIKE"),
]


def normalize_name(c: Column) -> Column:
    """upper, strip accents, alnum+space only, collapse whitespace
    (mismo/lib/name/_clean.py:11-45)."""
    out = F.upper(strip_accents(c))
    out = F.regexp_replace(out, r"[^A-Z0-9 ]", "")
    return F.nullif(F.regexp_replace(F.trim(out), r"\s+", " "), F.lit(""))


def name_tokens(*cols: Column) -> Column:
    """All tokens of all normalized name fields, flattened
    (mismo/lib/name/_clean.py:48-79)."""
    arrays = [
        F.when(c.isNull(), F.array().cast("array<string>")).otherwise(
            F.split(normalize_name(c), " ")
        )
        for c in cols
    ]
    return F.flatten(F.array(*arrays))


def nickname_pairs(spark) -> DataFrame:
    """(canonical, nick) pairs — broadcast-sized lookup
    (mismo/lib/name/_nicknames.py:106-125)."""
    return spark.createDataFrame(_NICKNAME_PAIRS, "canonical string, nick string")


def with_nickname_match(
    df: DataFrame,
    a,
    b,
    *,
    out: str = "is_nickname_match",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Add a boolean column: (a, b) is a known (canonical, nick) pair in
    either direction — a broadcast join against the nickname table
    (mismo/lib/name/_nicknames.py:68-103).  ``a``/``b`` are column names
    or Columns."""
    a = df[a] if isinstance(a, str) else a
    b = df[b] if isinstance(b, str) else b
    if pairs is None:
        pairs = nickname_pairs(df.sparkSession)
    sym = pairs.unionByName(
        pairs.select(
            F.col("nick").alias("canonical"), F.col("canonical").alias("nick")
        )
    ).withColumn("__hit", F.lit(True))
    keyed = df.withColumn("__na", normalize_name(a)).withColumn(
        "__nb", normalize_name(b)
    )
    joined = keyed.join(
        F.broadcast(sym),
        (keyed["__na"] == sym["canonical"]) & (keyed["__nb"] == sym["nick"]),
        "left",
    )
    return joined.withColumn(out, F.coalesce(F.col("__hit"), F.lit(False))).drop(
        "canonical", "nick", "__hit", "__na", "__nb"
    )
