"""UnionTable: a table that is the non-distinct union of sub-tables,
remembering its parts.

Semantics of mismo/types/_union_table.py:10-52: behaves as the unioned
table, but filter/select/mutate-style transforms distribute over the
parts so the provenance (which sub-table a row came from) is never
lost.  In Spark this costs nothing: unionByName is a no-shuffle
logical node and Catalyst pushes the distributed filters/projections
into each branch anyway.
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable

from pyspark.sql import Column, DataFrame


class UnionTable:
    def __init__(self, tables: Iterable[DataFrame]) -> None:
        tables = tuple(tables)
        if not tables:
            raise ValueError("At least one table must be provided.")
        self._tables = tables
        self.df: DataFrame = reduce(lambda a, b: a.unionByName(b), tables)

    @property
    def tables(self) -> tuple[DataFrame, ...]:
        return self._tables

    @property
    def columns(self) -> list[str]:
        return self.df.columns

    def count(self) -> int:
        return self.df.count()

    # transforms distribute over the parts (mismo/types/_union_table.py:34-52)

    def filter(self, predicate: Column) -> "UnionTable":
        return UnionTable(t.filter(predicate) for t in self._tables)

    def select(self, *exprs) -> "UnionTable":
        return UnionTable(t.select(*exprs) for t in self._tables)

    def withColumn(self, name: str, col: Column) -> "UnionTable":
        return UnionTable(t.withColumn(name, col) for t in self._tables)

    def withColumnRenamed(self, old: str, new: str) -> "UnionTable":
        return UnionTable(t.withColumnRenamed(old, new) for t in self._tables)

    def drop(self, *cols: str) -> "UnionTable":
        return UnionTable(t.drop(*cols) for t in self._tables)
