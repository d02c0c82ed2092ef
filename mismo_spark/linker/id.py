"""IDLinker: deterministic-identifier linkage with null/unequal policy.

Semantics of mismo/linker/_id_linker.py:13-127 — link records sharing a
(supposedly unique) identifier such as SSN.  Three pair classes:

* **match** — both ids non-null and equal (``__call__``).
* **nonmatch** — depending on policy: unequal ids
  (``when_not_equal="nonmatch"``) and/or null ids
  (``when_null="nonmatch"``).
* **indefinite** — everything that is neither a match nor a nonmatch;
  ``indefinite_linkage`` materializes it (the reference declares this
  method but leaves it NotImplemented, _id_linker.py:116-118 — here the
  three-way split is implemented: the indefinite condition is the union
  of the policies' "don't know" branches).

Scale note: the match linkage is an equi-join (shuffle on the id — the
cheap path).  The INDEFINITE set is inherently O(n·m) when materialized
(it is "all pairs except …"), so ``indefinite_linkage`` is
bounded-by-contract like FullLinker — at corpus scale use
``indefinite_condition`` as a FILTER over candidate pairs produced by a
real blocker instead of materializing the cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind_one
from mismo_spark.linker.base import infer_task
from mismo_spark.types.linkage import ID_L, ID_R, Linkage

_POLICIES = ("nonmatch", "indefinite")


class IDLinker:
    def __init__(
        self,
        labels,
        *,
        when_null: str = "nonmatch",
        when_not_equal: str = "nonmatch",
        task: str | None = None,
    ) -> None:
        if when_null not in _POLICIES:
            raise ValueError(
                f"when_null must be one of {_POLICIES}, got {when_null!r}"
            )
        if when_not_equal not in _POLICIES:
            raise ValueError(
                f"when_not_equal must be one of {_POLICIES}, got {when_not_equal!r}"
            )
        self.labels = labels
        self.when_null = when_null
        self.when_not_equal = when_not_equal
        self.task = task

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        """Match linkage: pairs whose ids are non-null and equal —
        policy-independent (mismo/linker/_id_linker.py:84-93)."""
        if right is None:
            right = left
        task = infer_task(left, right, self.task)
        l = left.select(
            F.col("record_id").alias(ID_L), bind_one(left, self.labels).alias("__id")
        ).na.drop(subset=["__id"])
        r = right.select(
            F.col("record_id").alias(ID_R), bind_one(right, self.labels).alias("__id")
        ).na.drop(subset=["__id"])
        pairs = l.join(r, "__id", "inner").select(ID_L, ID_R)
        if task == "dedupe":
            pairs = pairs.filter(F.col(ID_L) < F.col(ID_R))
        return Linkage(left=left, right=right, links=pairs)

    def indefinite_condition(self, id_l: Column, id_r: Column) -> Column | None:
        """Boolean column: the pair is neither a match nor a nonmatch
        under this linker's policies (mismo/linker/_id_linker.py:116-118,
        there NotImplemented).  ``None`` when both policies are
        "nonmatch" (nothing is indefinite).  Apply as a filter on a
        candidate-pair table carrying both id columns — the scale path;
        ``indefinite_linkage`` is the materialized variant."""
        conds = []
        if self.when_not_equal == "indefinite":
            conds.append(id_l.isNotNull() & id_r.isNotNull() & (id_l != id_r))
        if self.when_null == "indefinite":
            conds.append(id_l.isNull() | id_r.isNull())
        if not conds:
            return None
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out

    def indefinite_linkage(
        self, left: DataFrame, right: DataFrame | None = None
    ) -> Linkage:
        """Materialize the indefinite pairs (mismo's declared-but-NIE
        ``indefinite_linkage``).  O(n·m) by definition — bounded by
        contract like FullLinker; prefer ``indefinite_condition`` as a
        filter over blocked candidates at scale."""
        if right is None:
            right = left
        task = infer_task(left, right, self.task)
        l = left.select(
            F.col("record_id").alias(ID_L), bind_one(left, self.labels).alias("__idl")
        )
        r = right.select(
            F.col("record_id").alias(ID_R), bind_one(right, self.labels).alias("__idr")
        )
        cond = self.indefinite_condition(F.col("__idl"), F.col("__idr"))
        if cond is None:
            schema_links = l.crossJoin(r).select(ID_L, ID_R).limit(0)
            return Linkage(left=left, right=right, links=schema_links)
        pairs = l.crossJoin(r).filter(cond).select(ID_L, ID_R)
        if task == "dedupe":
            pairs = pairs.filter(F.col(ID_L) < F.col(ID_R))
        return Linkage(left=left, right=right, links=pairs)
