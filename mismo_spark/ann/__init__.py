"""Similarity search over embedding columns (array<float>).

Two paths:
* ``cosine_topk`` — brute-force exact top-k: cross join of queries ×
  corpus with the dot product as JVM-side column algebra, ranked with a
  per-query window.  The correctness baseline; viable when the query
  set is small (it is broadcast).
* ``lsh_cosine_topk`` — random-hyperplane (signed projection) LSH
  bucketing: candidates share at least one band bucket, then exact
  re-rank within candidates.  The scale path: shuffle is
  |corpus|·n_bands instead of |corpus|·|queries|.

Hyperplanes are generated from a seeded RNG on the driver and folded
into the plan as literals — deterministic everywhere.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot_lit(vec_col: Column, vec: np.ndarray) -> Column:
    """dot(column, literal vector) without shipping an array literal per
    row: Σ element_at(col, i)·w_i unrolled — constant-folded by Catalyst."""
    terms = [
        F.element_at(vec_col, i + 1) * float(w)
        for i, w in enumerate(vec)
        if w != 0.0
    ]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def _cosine(a: Column, b: Column) -> Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    denom = na * nb
    return F.when(denom == 0, F.lit(float("nan"))).otherwise(dot / denom)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> DataFrame:
    """Exact brute-force cosine top-k.

    → (query_id, neighbour_id, cosine) with ≤ k neighbours per query
    (self-matches excluded).  The query side is broadcast — the corpus
    is scanned once, no shuffle of the corpus until the final per-query
    top-k (window over query_id)."""
    q = queries.select(
        F.col(id_column).alias("query_id"),
        F.col(vec_column).cast("array<double>").alias("__qv"),
    )
    c = corpus.select(
        F.col(id_column).alias("neighbour_id"),
        F.col(vec_column).cast("array<double>").alias("__cv"),
    )
    scored = (
        c.join(F.broadcast(q))
        .filter(F.col("neighbour_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbour_id",
            _cosine(F.col("__qv"), F.col("__cv")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbour_id")
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def hyperplane_buckets(
    vec_col: Column,
    *,
    dim: int,
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 42,
) -> Column:
    """array<long> of n_bands bucket keys: per band, ``band_bits`` sign
    bits of seeded random projections packed into an int, plus the band
    index in the high bits."""
    rng = np.random.RandomState(seed)
    keys = []
    for b in range(n_bands):
        acc = F.lit(0).cast("long")
        for j in range(band_bits):
            h = rng.randn(dim)
            bit = (_dot_lit(vec_col, h) > 0).cast("long")
            acc = acc.bitwiseOR(F.shiftleft(bit, j))
        keys.append(acc.bitwiseOR(F.shiftleft(F.lit(b).cast("long"), 32)))
    return F.array(*keys)


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    dim: int | None = None,
    n_bands: int = 16,
    band_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k via random-hyperplane LSH buckets +
    exact re-rank within candidates."""
    if dim is None:
        dim = len(corpus.select(vec_column).first()[0])

    def keyed(df: DataFrame, id_alias: str, vec_alias: str) -> DataFrame:
        v = F.col(vec_column).cast("array<double>")
        return df.select(
            F.col(id_column).alias(id_alias),
            v.alias(vec_alias),
            F.explode(
                hyperplane_buckets(
                    v, dim=dim, n_bands=n_bands, band_bits=band_bits, seed=seed
                )
            ).alias("__bucket"),
        )

    c = keyed(corpus, "neighbour_id", "__cv")
    q = keyed(queries, "query_id", "__qv")
    cands = (
        c.join(q, "__bucket")
        .filter(F.col("neighbour_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbour_id"])
    )
    scored = cands.select(
        "query_id",
        "neighbour_id",
        _cosine(F.col("__qv"), F.col("__cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbour_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
