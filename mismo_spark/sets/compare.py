"""Set comparison — token-set Jaccard (mismo/sets/_compare.py:6-23)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def jaccard(a: Column, b: Column) -> Column:
    """|a∩b| / |a∪b| over DISTINCT elements; 0.0 when the intersection
    is empty (mismo/sets/_compare.py:6-23).  Pure higher-order column
    algebra — this is the token-set Jaccard of the north star, applied
    per pair inside whole-stage codegen."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(inter == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )
