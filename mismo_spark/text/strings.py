"""String normalization — pure column expressions (JVM-side).

Semantics of mismo/text/_strings.py:9-58.
"""

from __future__ import annotations

import unicodedata

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_whitespace(c: Column) -> Column:
    """strip + collapse runs of whitespace to one space
    (mismo/text/_strings.py:9-14)."""
    return F.regexp_replace(F.trim(c), r"\s+", " ")


# Latin-1/Latin-Extended accent folding via a translate table: stays in
# whole-stage codegen (no UDF).  Covers the same practical range as
# DuckDB's strip_accents for western scripts (mismo/text/_strings.py:17-58);
# characters outside the table pass through unchanged.
_ACCENTED = (
    "ÀÁÂÃÄÅàáâãäåÈÉÊËèéêëÌÍÎÏìíîïÒÓÔÕÖØòóôõöøÙÚÛÜùúûüÝŸýÿÑñÇçŠšŽžÀ"
)


def _fold(ch: str) -> str:
    d = unicodedata.normalize("NFKD", ch)
    stripped = "".join(x for x in d if not unicodedata.combining(x))
    return stripped if len(stripped) == 1 else ch


_SRC = "".join(dict.fromkeys(_ACCENTED))
_DST = "".join(_fold(ch) for ch in _SRC)


def strip_accents(c: Column) -> Column:
    """é→e etc. (mismo/text/_strings.py:17-58)."""
    return F.translate(c, _SRC, _DST)
