"""Struct column utilities (semantics of mismo/_structs.py:10-78)."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def _field_names(dtype: StructType) -> list[str]:
    return [f.name for f in dtype.fields]


def struct_mutate(s: Column, names: Sequence[str], **updates: Column) -> Column:
    """Rebuild the struct with some fields replaced/added.  ``names`` is
    the struct's current field list (Spark Columns don't expose their
    own dtype pre-analysis)."""
    fields = [
        (updates.pop(n) if n in updates else s[n]).alias(n) for n in names
    ]
    fields += [c.alias(n) for n, c in updates.items()]
    return F.struct(*fields)


def struct_select(s: Column, names: Sequence[str]) -> Column:
    return F.struct(*[s[n].alias(n) for n in names])


def struct_drop(s: Column, names: Sequence[str], drop: Sequence[str]) -> Column:
    return F.struct(*[s[n].alias(n) for n in names if n not in set(drop)])


def struct_rename(s: Column, names: Sequence[str], mapping: dict[str, str]) -> Column:
    return F.struct(*[s[n].alias(mapping.get(n, n)) for n in names])


def struct_equal(a: Column, b: Column, names: Sequence[str]) -> Column:
    """Field-wise null-safe equality (mismo/_structs.py:44-56)."""
    out = F.lit(True)
    for n in names:
        out = out & a[n].eqNullSafe(b[n])
    return out


def struct_isnull(s: Column, names: Sequence[str], *, how: str = "any") -> Column:
    """any/all fields null (mismo/_structs.py:59-78)."""
    flags = [s[n].isNull() for n in names]
    out = flags[0]
    for f in flags[1:]:
        out = (out | f) if how == "any" else (out & f)
    return out
