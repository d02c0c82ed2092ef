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

Hyperplanes are generated from a seeded RNG on the driver and closed
over by one Arrow pandas UDF (numpy matmul per batch) — deterministic
everywhere, replayable by the DuckDB oracle from the same seed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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
    index in the high bits.

    Executed as ONE Arrow pandas UDF doing a fused numpy matmul
    (batch × hyperplanesᵀ).  A column-algebra unrolling of the
    n_bands·band_bits·dim dot-product terms was tried first and is a
    trap: the ~4096-node expression tree makes janino codegen fail
    (slowly) and the interpreted fallback does thousands of virtual
    calls per row — the matmul is 10-100× faster and one Arrow pass.
    Hyperplanes come from a seeded driver-side RNG closed over by the
    UDF (band-major draw order), so bucket values are deterministic and
    replayable in any engine (the DuckDB oracle rebuilds them as SQL
    literals from the same seed)."""
    from pyspark.sql.types import ArrayType, LongType

    rng = np.random.RandomState(seed)
    # band-major draw order — the oracle replays this exact sequence
    hp = np.stack([rng.randn(dim) for _ in range(n_bands * band_bits)])
    weights = (1 << np.arange(band_bits)).astype(np.int64)
    band_tags = (np.arange(n_bands, dtype=np.int64) << 32)[None, :]

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        vals = v.to_numpy()
        valid = np.array([x is not None for x in vals])
        out = np.empty(len(vals), dtype=object)
        if valid.any():
            m = np.stack(vals[valid]).astype(np.float64)
            bits = (m @ hp.T) > 0  # (n, n_bands*band_bits)
            packed = (
                bits.reshape(len(m), n_bands, band_bits) * weights
            ).sum(axis=2).astype(np.int64) | band_tags
            ids = np.flatnonzero(valid)
            for i, row in zip(ids, packed):
                out[i] = row.tolist()
        return pd.Series(out)

    return _buckets(vec_col.cast("array<double>"))


def embedding_near_duplicates(
    df: DataFrame,
    *,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    min_cosine: float = 0.9,
    dim: int | None = None,
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within one corpus.

    → (id_l, id_r, cosine) with id_l < id_r, for pairs that share at
    least one random-hyperplane band bucket AND have exact cosine ≥
    ``min_cosine``.  The scale path for corpus-wide near-dup detection
    (the self-join sibling of ``lsh_cosine_topk``): shuffle is
    |corpus|·n_bands bucket rows, candidates are an equi-join per
    bucket — never an all-pairs product.  The exact-cosine recheck runs
    once per DISTINCT candidate pair.

    ``max_bucket_size`` (optional) drops buckets with more members than
    the cap before pairing — a skew guard for degenerate corpora where
    one bucket would go quadratic; documented recall tradeoff, off by
    default so results stay exactly the bucket-join semantics.

    Deterministic everywhere: hyperplanes are seeded driver-side and
    folded into the plan as literals (reproducible in any engine, so
    the driver's DuckDB oracle can replay candidate generation exactly).
    """
    if dim is None:
        dim = len(df.select(vec_column).first()[0])
    v = F.col(vec_column).cast("array<double>")
    keyed = df.select(
        F.col(id_column).alias("__id"),
        v.alias("__v"),
        F.explode(
            hyperplane_buckets(
                v, dim=dim, n_bands=n_bands, band_bits=band_bits, seed=seed
            )
        ).alias("__bucket"),
    )
    if max_bucket_size is not None:
        w = Window.partitionBy("__bucket")
        keyed = keyed.withColumn("__bsz", F.count(F.lit(1)).over(w)).filter(
            F.col("__bsz") <= max_bucket_size
        )
    # two projections of the SAME exploded plan → Spark reuses the
    # bucket-partitioned exchange for both sides of the self-join
    left = keyed.select(
        F.col("__id").alias("id_l"), F.col("__v").alias("__vl"), "__bucket"
    )
    right = keyed.select(
        F.col("__id").alias("id_r"), F.col("__v").alias("__vr"), "__bucket"
    )
    cands = (
        left.join(right, "__bucket")
        .filter(F.col("id_l") < F.col("id_r"))
        .dropDuplicates(["id_l", "id_r"])
    )
    return cands.select(
        "id_l",
        "id_r",
        _cosine(F.col("__vl"), F.col("__vr")).alias("cosine"),
    ).filter(F.col("cosine") >= min_cosine)


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
