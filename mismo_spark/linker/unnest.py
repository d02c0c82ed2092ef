"""UnnestLinker: block where ANY array element matches.

Semantics of mismo/linker/_unnest.py:12-99: explode the array column on
both sides, equi-join on the element, dedupe pairs that matched on more
than one element.

Plan shape: explode is a generator inside whole-stage codegen (no
shuffle); the join shuffles on the token — the shuffle volume is
Σ|tokens|, which is why token-blocking wants rare tokens
(pair with ``sets.rare_terms`` / idf filtering at scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind_one
from mismo_spark.linker.base import infer_task
from mismo_spark.types.linkage import ID_L, ID_R, Linkage


class UnnestLinker:
    def __init__(self, column, *, task: str | None = None) -> None:
        self.column = column
        self.task = task

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        if right is None:
            right = left
        task = infer_task(left, right, self.task)
        lx = left.select(
            F.col("record_id").alias(ID_L),
            F.explode(bind_one(left, self.column)).alias("__tok"),
        )
        rx = right.select(
            F.col("record_id").alias(ID_R),
            F.explode(bind_one(right, self.column)).alias("__tok"),
        )
        pairs = lx.join(rx, "__tok", "inner").select(ID_L, ID_R)
        if task == "dedupe":
            pairs = pairs.filter(F.col(ID_L) < F.col(ID_R))
        links = pairs.dropDuplicates([ID_L, ID_R])
        return Linkage(left=left, right=right, links=links)
