"""FullLinker (cross product) and EmptyLinker (no pairs).

Semantics of mismo/linker/_basic.py:11-40.  FullLinker is only for
bounded-size u-sampling — the slow-join guard in JoinLinker exists
precisely to stop this plan appearing by accident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from mismo_spark.linker.base import infer_task
from mismo_spark.types.linkage import ID_L, ID_R, Linkage


class FullLinker:
    """All M×N pairs (mismo/linker/_basic.py:11-25)."""

    def __init__(self, task: str | None = None) -> None:
        self.task = task

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        if right is None:
            right = left
        task = infer_task(left, right, self.task)
        links = left.select(F.col("record_id").alias(ID_L)).crossJoin(
            right.select(F.col("record_id").alias(ID_R))
        )
        if task == "dedupe":
            links = links.filter(F.col(ID_L) < F.col(ID_R))
        return Linkage(left=left, right=right, links=links)


class EmptyLinker:
    """No pairs, correctly-typed empty links (mismo/linker/_basic.py:28-40)."""

    def __init__(self, task: str | None = None) -> None:
        self.task = task

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        if right is None:
            right = left
        id_type = left.schema["record_id"].dataType
        schema = StructType(
            [StructField(ID_L, id_type, True), StructField(ID_R, id_type, True)]
        )
        links = left.sparkSession.createDataFrame([], schema)
        return Linkage(left=left, right=right, links=links)
