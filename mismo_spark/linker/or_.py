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
    def __init__(
        self, linkers, *, task: str | None = None, track_rules: bool = True
    ) -> None:
        """``linkers``: mapping name → Linker, or iterable of Linkers.

        ``track_rules`` (default True, reference semantics): annotate
        each pair with the sorted array of rule names that produced it.
        That provenance is a ``collect_set`` per pair — a
        TypedImperativeAggregate that always falls back to sort-based
        aggregation (ObjectHashAggregate's 128-key in-memory limit), so
        on a billion-pair candidate table it is a material cost.  Pass
        ``track_rules=False`` in production pipelines that only need
        the pair set: dedup becomes a plain codegen hash aggregate with
        map-side partial combine."""
        if isinstance(linkers, dict):
            self.linkers = dict(linkers)
        else:
            self.linkers = {f"rule_{i}": lk for i, lk in enumerate(linkers)}
        self.task = task
        self.track_rules = track_rules

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        if right is None:
            right = left
        parts = []
        for name, linker in self.linkers.items():
            raw = getattr(linker, "raw_pairs", None)
            if raw is not None and not self.track_rules:
                # rule's pairs may repeat (e.g. one LSH pair per matching
                # band) — our final dropDuplicates covers it, so skip the
                # rule's internal distinct: one full-pair-set shuffle
                # instead of two back-to-back
                part = raw(left, right).select(ID_L, ID_R)
            else:
                part = linker(left, right).links.select(ID_L, ID_R)
            if self.track_rules:
                part = part.withColumn("rule", F.lit(name))
            parts.append(part)
        unioned = reduce(DataFrame.unionByName, parts)
        if self.track_rules:
            # one pair per (l, r); provenance = sorted array of rule names
            links = unioned.groupBy(ID_L, ID_R).agg(
                F.array_sort(F.collect_set("rule")).alias("blocking_rules")
            )
        else:
            links = unioned.dropDuplicates([ID_L, ID_R])
        return Linkage(left=left, right=right, links=links)
