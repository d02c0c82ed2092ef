"""Best-match comparison over set-valued fields.

Semantics of the reference's EmailsDimension / PhonesDimension compare
step (mismo/lib/phone/_core.py:132-180, mismo/lib/email/_core.py
EmailsDimension): each record holds an array of values; a pair's level
is the BEST (minimum enum) match level over the cartesian product of
the two arrays.

The reference maps a scalar function over ``array_combinations``; our
level functions may contain pandas UDFs, which cannot run inside
higher-order lambdas — so the combos are exploded to rows, levelled,
and min-aggregated back (one shuffle on the pair ids; combos per pair
are bounded by the array sizes, typically ≤ a few dozen).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark.types.linkage import ID_L, ID_R


def best_pairwise_level(
    pairs: DataFrame,
    array_l: str,
    array_r: str,
    level_fn: Callable[[Column, Column], Column],
    *,
    out: str,
    else_level: int,
) -> DataFrame:
    """Add ``out`` = min over all (x ∈ array_l, y ∈ array_r) of
    ``level_fn(x, y)``; pairs with empty/null arrays get ``else_level``.
    """
    exploded = (
        pairs.select(ID_L, ID_R, F.explode(array_l).alias("__vl"), F.col(array_r))
        .select(ID_L, ID_R, "__vl", F.explode(array_r).alias("__vr"))
    )
    levelled = exploded.select(
        ID_L, ID_R, level_fn(F.col("__vl"), F.col("__vr")).alias("__lvl")
    )
    best = levelled.groupBy(ID_L, ID_R).agg(F.min("__lvl").alias(out))
    return pairs.join(best, [ID_L, ID_R], "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(else_level))
    )
