"""Named-group regex → struct extraction.

The reference needs a custom Ibis op + DuckDB compiler monkeypatch for
this (mismo/text/_re_extract.py:14-72); in Spark it's just one
``regexp_extract`` per group composed into ``F.struct`` — no custom
Catalyst work required.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_NAMED_GROUP = re.compile(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>")


def re_extract_struct(c: Column, pattern: str) -> Column:
    """Extract all named groups of ``pattern`` into a struct column.

    >>> re_extract_struct(F.lit("a-12"), r"(?P<word>[a-z]+)-(?P<num>\\d+)")
    ... # struct<word:'a', num:'12'>
    """
    names = _NAMED_GROUP.findall(pattern)
    if not names:
        raise ValueError(f"pattern has no named groups: {pattern!r}")
    # spark's regex engine (java) uses (?<name>...) syntax; group INDEX
    # extraction works for both, so map names to their group numbers
    compiled = re.compile(pattern)
    fields = [
        F.regexp_extract(c, pattern.replace("?P<", "?<"), compiled.groupindex[n]).alias(n)
        for n in names
    ]
    return F.struct(*fields)
