"""Dense-array and sparse-map vector math — higher-order column algebra.

Semantics of mismo/vector/_vector.py:29-242.  All JVM-side: zip_with /
aggregate / transform_values; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _is_map(c_dtype: str) -> bool:
    return c_dtype.startswith("map")


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns
    (mismo/vector/_vector.py:29-64)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_maps(a: Column, b: Column) -> Column:
    """Dot product of two map<K,double> sparse vectors over shared keys
    (mismo/vector/_vector.py:29-64, _shared_vals :233-242)."""
    shared = F.map_filter(a, lambda k, v: F.map_contains_key(b, k))
    prods = F.transform_values(shared, lambda k, v: v * F.element_at(b, k))
    return F.aggregate(F.map_values(prods), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column, metric: str = "l2") -> Column:
    """Vector norm of an array column (mismo/vector/_vector.py:113-168)."""
    if metric == "l2":
        return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    if metric == "l1":
        return F.aggregate(a, F.lit(0.0), lambda acc, v: acc + F.abs(v))
    raise ValueError(f"unknown norm {metric!r}")


def normalize(a: Column, metric: str = "l2") -> Column:
    """Scale to unit norm (mismo/vector/_vector.py:171-223)."""
    n = norm(a, metric)
    return F.when(n > 0, F.transform(a, lambda v: v / n)).otherwise(a)


def mul(a: Column, b: Column) -> Column:
    """Elementwise multiply (mismo/vector/_vector.py:105-110)."""
    return F.zip_with(a, b, lambda x, y: x * y)


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a|·|b|) for array columns
    (mismo/vector/_vector.py:67-102).  Zero-norm → NaN (ANSI-safe)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(float("nan"))).otherwise(dot(a, b) / denom)
