"""Person-name normalization and comparison helpers.

Semantics of mismo/lib/name/_clean.py:11-79,
mismo/lib/name/_nicknames.py:68-125 (the built-in sample is a
fallback — pass a CSV path / pair list / DataFrame anywhere a
``pairs``/``nickname_pairs`` argument appears to use a full table;
see ``load_nickname_pairs``), and
mismo/lib/name/_compare.py:12-155 (NameMatchLevel / NameComparer).
"""

from __future__ import annotations

from enum import IntEnum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark.text.strings import strip_accents

# in-code fallback used only if lib/data/nicknames.csv (the bundled
# 362-pair dataset, the default source) cannot be read
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


def load_nickname_pairs(source) -> list[tuple[str, str]]:
    """Resolve a nickname-pair source to a list of (canonical, nick).

    ``source`` may be ``None`` (the bundled table —
    ``lib/data/nicknames.csv``, ~330 classic English diminutive pairs,
    mirroring the reference's bundled nickname CSV
    mismo/lib/name/_nicknames.py:106-125 — falling back to the tiny
    in-code sample if the data file is missing from a trimmed
    install), an existing list of pairs, or a path to a two-column CSV
    (``canonical,nick``; a header row is auto-detected and skipped).
    The table is
    broadcast-sized by contract — the reference materializes the whole
    `nicknames` package lookup the same way
    (mismo/lib/name/_nicknames.py:86-105) — so a driver-side read is
    the right shape: the pairs become literals / a broadcast join, and
    executors never touch the file."""
    if source is None:
        import os

        bundled = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "data", "nicknames.csv"
        )
        if os.path.exists(bundled):
            return load_nickname_pairs(bundled)
        return list(_NICKNAME_PAIRS)
    if isinstance(source, list):
        return source
    import csv

    pairs: list[tuple[str, str]] = []
    with open(source, newline="") as f:
        for i, row in enumerate(csv.reader(f)):
            if not row or len(row) < 2:
                continue
            a, b = row[0].strip(), row[1].strip()
            if i == 0 and {a.lower(), b.lower()} & {"canonical", "nick", "nickname"}:
                continue  # header row
            if a and b:
                pairs.append((a, b))
    return pairs


def nickname_pairs(spark, source=None) -> DataFrame:
    """(canonical, nick) pairs as a broadcast-sized lookup table
    (mismo/lib/name/_nicknames.py:106-125).  ``source`` as in
    :func:`load_nickname_pairs`."""
    return spark.createDataFrame(
        load_nickname_pairs(source), "canonical string, nick string"
    )


def with_nickname_match(
    df: DataFrame,
    a,
    b,
    *,
    out: str = "is_nickname_match",
    pairs: DataFrame | str | None = None,
) -> DataFrame:
    """Add a boolean column: (a, b) is a known (canonical, nick) pair in
    either direction — a broadcast join against the nickname table
    (mismo/lib/name/_nicknames.py:68-103).  ``a``/``b`` are column names
    or Columns; ``pairs`` a prepared DataFrame, a CSV path, or None."""
    a = df[a] if isinstance(a, str) else a
    b = df[b] if isinstance(b, str) else b
    if pairs is None or isinstance(pairs, str):
        pairs = nickname_pairs(df.sparkSession, pairs)
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


# ---------------------------------------------------------------------------
# NameMatchLevel / NameComparer (mismo/lib/name/_compare.py:12-155)
# ---------------------------------------------------------------------------


class NameMatchLevel(IntEnum):
    """How closely two names match (mismo/lib/name/_compare.py:53-69)."""

    NULL = 0
    EXACT = 1
    GIVEN_SURNAME = 2
    NICKNAMES = 3
    INITIALS = 4
    TYPO = 5
    ELSE = 6


NAME_FIELDS = ("prefix", "given", "middle", "surname", "suffix", "nickname")


def NameStruct(
    *,
    prefix: Column | str | None = None,
    given: Column | str | None = None,
    middle: Column | str | None = None,
    surname: Column | str | None = None,
    suffix: Column | str | None = None,
    nickname: Column | str | None = None,
) -> Column:
    """Build a struct<prefix,given,middle,surname,suffix,nickname>
    column — the shape every name op here consumes
    (mismo/lib/name/_clean.py:32-40, where NameStruct is the ibis struct
    type; on Spark the constructor is the useful artifact).  Omitted
    fields become NULL strings; plain str args become literals."""
    vals = dict(prefix=prefix, given=given, middle=middle,
                surname=surname, suffix=suffix, nickname=nickname)
    cols = []
    for f in NAME_FIELDS:
        v = vals[f]
        if v is None:
            c = F.lit(None).cast("string")
        elif isinstance(v, str):
            c = F.lit(v)
        else:
            c = v
        cols.append(c.alias(f))
    return F.struct(*cols)


def are_aliases(
    a: Column, b: Column, *, pairs: list[tuple[str, str]] | str | None = None
) -> Column:
    """True when the two names are nickname-interchangeable (either
    direction) or equal; case-insensitive, ends-trimmed
    (mismo/lib/name/_compare.py's are_aliases via
    mismo/lib/name/_nicknames.py:21-84).  ``pairs`` may be a list, a
    CSV path, or None (built-in sample) — see
    :func:`load_nickname_pairs`.

    The nickname data is a broadcast-sized literal set, so this stays a
    pure column expression (``isin`` over literals — same shape as the
    reference's ``needle.isin(memtable column)``)."""
    pairs = load_nickname_pairs(pairs)
    an = F.lower(F.trim(a))
    bn = F.lower(F.trim(b))
    needle = F.concat_ws("\x1f", an, bn)
    lits = sorted(
        {f"{x.lower()}\x1f{y.lower()}" for x, y in pairs}
        | {f"{y.lower()}\x1f{x.lower()}" for x, y in pairs}
    )
    return needle.isin(*lits) | (an == bn)


def is_nickname_for(
    nickname: Column,
    canonical: Column,
    *,
    pairs: list[tuple[str, str]] | str | None = None,
) -> Column:
    """True when ``nickname`` is a known nickname of ``canonical``
    (DIRECTIONAL — 'BILL is a nickname for WILLIAM' but not the
    reverse) or the two are equal; case-insensitive, ends-trimmed
    (mismo/lib/name/_nicknames.py:40-84).  Same broadcast-literal
    ``isin`` shape as :func:`are_aliases`."""
    pairs = load_nickname_pairs(pairs)
    nn = F.lower(F.trim(nickname))
    cn = F.lower(F.trim(canonical))
    needle = F.concat_ws("\x1f", cn, nn)
    lits = sorted({f"{x.lower()}\x1f{y.lower()}" for x, y in pairs})
    return needle.isin(*lits) | (nn == cn)


def initials_equal(a: Column, b: Column) -> Column:
    """First letter matches and at least one side is a single letter
    (mismo/lib/name/_compare.py:22-29)."""
    return (F.substring(a, 1, 1) == F.substring(b, 1, 1)) & (
        (F.length(a) == 1) | (F.length(b) == 1)
    )


def _substring_match(a: Column, b: Column, *, min_len: int = 3) -> Column:
    """Shorter string contained in longer, and at least min_len
    (mismo/lib/name/_compare.py:43-50)."""
    return (F.contains(a, b) & (F.length(b) >= min_len)) | (
        F.contains(b, a) & (F.length(a) >= min_len)
    )


def equal_forgiving_typo(a: Column, b: Column) -> Column:
    """Edit distance ≤ 1, or ≤ 2 for longer-than-5 strings, or substring
    containment (mismo/lib/name/_compare.py:32-40)."""
    from mismo_spark.text.similarity import damerau_levenshtein

    dl = damerau_levenshtein(a, b)
    return (dl <= 1) | ((dl <= 2) & (F.length(a) > 5)) | _substring_match(a, b)


def name_match_level(
    left: Column,
    right: Column,
    *,
    nickname_pairs: list[tuple[str, str]] | str | None = None,
) -> Column:
    """Agreement level of two name structs
    (struct<prefix,given,middle,surname,suffix,nickname>), assumed
    already normalized.  First-match-wins CASE mirroring the
    reference's order exactly — note TYPO is checked BEFORE INITIALS
    despite the enum values (mismo/lib/name/_compare.py:72-107)."""
    from mismo_spark._util import cases
    from mismo_spark.structs import struct_equal, struct_isnull

    surname_eq = left["surname"] == right["surname"]
    return cases(
        [
            (
                struct_isnull(left, ["given", "surname"], how="any")
                | struct_isnull(right, ["given", "surname"], how="any"),
                F.lit(int(NameMatchLevel.NULL)),
            ),
            (
                struct_equal(left, right, NAME_FIELDS),
                F.lit(int(NameMatchLevel.EXACT)),
            ),
            (
                struct_equal(left, right, ["given", "surname"]),
                F.lit(int(NameMatchLevel.GIVEN_SURNAME)),
            ),
            (
                are_aliases(left["given"], right["given"], pairs=nickname_pairs)
                & surname_eq,
                F.lit(int(NameMatchLevel.NICKNAMES)),
            ),
            (
                equal_forgiving_typo(left["given"], right["given"]) & surname_eq,
                F.lit(int(NameMatchLevel.TYPO)),
            ),
            (
                initials_equal(left["given"], right["given"]) & surname_eq,
                F.lit(int(NameMatchLevel.INITIALS)),
            ),
        ],
        else_=F.lit(int(NameMatchLevel.ELSE)),
    )


def normalize_name_struct(name: Column) -> Column:
    """Normalize every field of a
    struct<prefix,given,middle,surname,suffix,nickname> name
    (mismo/lib/name/_clean.py:43-68: the struct-level normalize_name —
    our :func:`normalize_name` is the field-level normalizer)."""
    return F.struct(
        *[normalize_name(name[f]).alias(f) for f in NAME_FIELDS]
    )


class NameDimension:
    """Prepare, block, and compare on a human-name struct column
    (mismo/lib/name/_dimension.py:8-73): ``prepare_for_fast_linking``
    adds the normalized struct, ``prepare_for_blocking`` adds the
    flattened unique token array (an UnnestLinker-ready blocking key),
    ``compare`` adds the NameMatchLevel column on a pairs table."""

    def __init__(
        self,
        column: str,
        *,
        column_normed: str = "{column}_normed",
        column_tokens: str = "{column}_tokens",
        column_compared: str = "{column}_compared",
        nickname_pairs: list[tuple[str, str]] | str | None = None,
    ) -> None:
        self.column = column
        self.column_normed = column_normed.format(column=column)
        self.column_tokens = column_tokens.format(column=column)
        self.column_compared = column_compared.format(column=column)
        self.comparer = NameComparer(
            self.column_normed + "_l",
            self.column_normed + "_r",
            result_column=self.column_compared,
            nickname_pairs=nickname_pairs,
        )

    def prepare_for_fast_linking(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            self.column_normed, normalize_name_struct(df[self.column])
        )

    def prepare_for_blocking(self, df: DataFrame) -> DataFrame:
        normed = df[self.column_normed]
        return df.withColumn(
            self.column_tokens,
            F.array_distinct(
                F.filter(
                    name_tokens(*[normed[f] for f in NAME_FIELDS]),
                    lambda t: (t.isNotNull()) & (t != ""),
                )
            ),
        )

    def compare(self, pairs: DataFrame) -> DataFrame:
        return self.comparer(pairs)


class NameComparer:
    """Compare name structs on a pairs table
    (mismo/lib/name/_compare.py:110-155)."""

    Levels = NameMatchLevel

    def __init__(
        self,
        left_column: str = "name_l",
        right_column: str = "name_r",
        *,
        result_column: str | None = None,
        nickname_pairs: list[tuple[str, str]] | str | None = None,
    ) -> None:
        self.left_column = left_column
        self.right_column = right_column
        self.name = result_column or f"{left_column}_vs_{right_column}"
        self.nickname_pairs = nickname_pairs

    def __call__(self, pairs: DataFrame) -> DataFrame:
        return pairs.withColumn(
            self.name,
            name_match_level(
                pairs[self.left_column],
                pairs[self.right_column],
                nickname_pairs=self.nickname_pairs,
            ),
        )
