"""OrLinker: logical OR of N blocking rules as N fast joins + union.

Semantics of mismo/linker/_or_linker.py:20-77.  An OR join-condition
forces a nested-loop plan in every engine (Catalyst included — it does
NOT rewrite OR-joins to unions), so each rule runs as its own equi-join
and the results are unioned with pair-level dedup.

The reference removes overlap *inside* each join
(cond_i ∧ ¬cond_1..i−1, mismo/joins/_core.py:148-162); we instead union
and ``dropDuplicates`` on the pair ids — the same pair set, one shuffle,
and we keep per-rule provenance in a ``blocking_rules`` array column.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark.types.linkage import ID_L, ID_R, Linkage


class OrLinker:
    def __init__(self, linkers, *, task: str | None = None) -> None:
        """``linkers``: mapping name → Linker, or iterable of Linkers."""
        if isinstance(linkers, dict):
            self.linkers = dict(linkers)
        else:
            self.linkers = {f"rule_{i}": lk for i, lk in enumerate(linkers)}
        self.task = task

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        if right is None:
            right = left
        parts = []
        for name, linker in self.linkers.items():
            lk = linker(left, right)
            parts.append(
                lk.links.select(ID_L, ID_R).withColumn("rule", F.lit(name))
            )
        unioned = reduce(DataFrame.unionByName, parts)
        # one pair per (l, r); provenance = sorted array of rule names
        links = unioned.groupBy(ID_L, ID_R).agg(
            F.array_sort(F.collect_set("rule")).alias("blocking_rules")
        )
        return Linkage(left=left, right=right, links=links)
