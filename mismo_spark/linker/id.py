"""IDLinker: deterministic-identifier linkage with null policy.

Semantics of mismo/linker/_id_linker.py:13-127 — link records sharing a
(supposedly unique) identifier such as SSN; rows with null ids never
match (`when_null="nonmatch"`); the reference's "indefinite" policy is
unimplemented there too (`mismo/linker/_id_linker.py:116-118`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind_one
from mismo_spark.linker.base import infer_task
from mismo_spark.types.linkage import ID_L, ID_R, Linkage


class IDLinker:
    def __init__(
        self, labels, *, when_null: str = "nonmatch", task: str | None = None
    ) -> None:
        if when_null != "nonmatch":
            raise NotImplementedError(
                "only when_null='nonmatch' is supported "
                "(the reference's 'indefinite' is unimplemented as well, "
                "mismo/linker/_id_linker.py:116-118)"
            )
        self.labels = labels
        self.task = task

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
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
