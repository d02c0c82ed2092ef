"""Datasets: ordered collection of record tables (dedupe=1, linkage=2).

Semantics of mismo/_datasets.py:11-149.
"""

from __future__ import annotations

from collections import OrderedDict
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Datasets:
    def __init__(self, tables: dict[str, DataFrame]) -> None:
        for name, df in tables.items():
            if "record_id" not in df.columns:
                raise ValueError(f"dataset {name!r} lacks a record_id column")
        self._tables = OrderedDict(tables)

    def __getitem__(self, name: str) -> DataFrame:
        return self._tables[name]

    def __iter__(self):
        return iter(self._tables.values())

    def __len__(self) -> int:
        return len(self._tables)

    @property
    def names(self) -> list[str]:
        return list(self._tables)

    def shared_schema(self) -> list[tuple[str, str]]:
        """(name, dtype) of columns present with identical type in ALL
        tables (mismo/_datasets.py:115-136)."""
        its = iter(self._tables.values())
        first = next(its)
        shared = {f.name: f.dataType.simpleString() for f in first.schema.fields}
        for df in its:
            types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
            shared = {
                n: t for n, t in shared.items() if types.get(n) == t
            }
        # preserve first table's column order
        return [
            (f.name, shared[f.name])
            for f in first.schema.fields
            if f.name in shared
        ]

    def unioned(self) -> DataFrame:
        """Non-distinct union over the shared schema, with a ``dataset``
        provenance column (mismo/_datasets.py:138-145)."""
        cols = [n for n, _ in self.shared_schema()]
        parts = [
            df.select(*cols).withColumn("dataset", F.lit(name))
            for name, df in self._tables.items()
        ]
        return reduce(DataFrame.unionByName, parts)

    def all_record_ids(self) -> DataFrame:
        """mismo/_datasets.py:147-149."""
        parts = [df.select("record_id") for df in self._tables.values()]
        return reduce(DataFrame.unionByName, parts).distinct()
