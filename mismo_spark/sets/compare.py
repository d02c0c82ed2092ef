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


def jaccard_distinct(a: Column, b: Column) -> Column:
    """Jaccard for arrays ALREADY distinct on each side (e.g. the
    pipeline's ``array_distinct``-then-hash token/shingle columns).

    Same values as :func:`jaccard`, but |a∪b| = |a|+|b|−|a∩b| replaces
    ``array_union`` — array_intersect/array_union each build a hash set
    per evaluated pair (SQLOpenHashSet), and on a candidate-pair table
    those per-pair allocations are the compare stage's main JVM cost;
    this form halves them.  DO NOT use on arrays with duplicates (the
    arithmetic over-counts the union)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(a) + F.size(b) - inter
    return F.when(inter == 0, F.lit(0.0)).otherwise(
        inter.cast("double") / union.cast("double")
    )
