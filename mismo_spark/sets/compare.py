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


def containment(a: Column, b: Column) -> Column:
    """|a∩b| / |a| over DISTINCT elements — how much of ``a`` lies inside
    ``b`` (asymmetric; the web-dedup signal Jaccard misses: a short page
    quoted wholesale inside a long one scores ~1.0 here but low Jaccard).
    0.0 when ``a`` is empty; NULL if either side is NULL."""
    inter = F.size(F.array_intersect(a, b))
    na = F.size(F.array_distinct(a))
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(na == 0, F.lit(0.0)).otherwise(inter.cast("double") / na)
    )


def overlap_coefficient(a: Column, b: Column) -> Column:
    """|a∩b| / min(|a|, |b|) over DISTINCT elements (Szymkiewicz-Simpson).
    0.0 when either side is empty; NULL if either side is NULL."""
    inter = F.size(F.array_intersect(a, b))
    mn = F.least(F.size(F.array_distinct(a)), F.size(F.array_distinct(b)))
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(mn == 0, F.lit(0.0)).otherwise(inter.cast("double") / mn)
    )


def tversky(a: Column, b: Column, *, alpha: float = 0.5, beta: float = 0.5) -> Column:
    """Tversky index (Tversky 1977) over DISTINCT elements:

        |a∩b| / (|a∩b| + α·|a−b| + β·|b−a|)

    The parametric family containing the others: α=β=1 → Jaccard,
    α=β=0.5 → Dice, α=1,β=0 → containment(a in b).  Asymmetric weights
    encode which side is the "prototype" — e.g. α<β scores a short
    query against a long document leniently.  0.0 when both differences
    and the intersection are empty; NULL if either side is NULL.  Pure
    column algebra (two hash-set builds per pair, same cost class as
    :func:`jaccard`)."""
    inter = F.size(F.array_intersect(a, b)).cast("double")
    na = F.size(F.array_distinct(a)).cast("double")
    nb = F.size(F.array_distinct(b)).cast("double")
    denom = inter + alpha * (na - inter) + beta * (nb - inter)
    return F.when(a.isNull() | b.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(denom == 0, F.lit(0.0)).otherwise(inter / denom)
    )


def dice(a: Column, b: Column) -> Column:
    """Sørensen–Dice coefficient: 2·|a∩b| / (|a|+|b|) over DISTINCT
    elements — :func:`tversky` at α=β=0.5, named for discoverability."""
    return tversky(a, b, alpha=0.5, beta=0.5)
