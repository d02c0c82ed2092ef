"""IVF (inverted-file) approximate nearest-neighbour search.

The scale path beyond hyperplane LSH when the corpus is huge and
queries are many: partition the corpus into ``n_lists`` Voronoi cells
(k-means over a sample), store each vector under its cell id, and probe
only the ``n_probe`` cells nearest to each query — candidate volume is
|corpus|·n_probe/n_lists instead of |corpus|.

Spark-first layout:
* centroids are trained on a DETERMINISTIC sample (hash-ordered, no
  Math.random) with Lloyd iterations expressed as DataFrame aggs —
  assignment is a numpy matmul inside an Arrow pandas UDF (k×dim fits
  in every executor), the centroid update is posexplode → groupBy
  (cell, position) avg, collected back to the driver (k×dim rows,
  tiny);
* the cell assignment column is a natural PARTITION/bucket key for the
  stored corpus: writing the indexed corpus partitioned by ``cell``
  turns every probe into partition pruning at read time;
* the probe is an equi-join corpus.cell == query.cell (query side
  exploded to its n_probe cells and broadcast when small), then exact
  cosine re-rank within candidates.

This is an iterative algorithm (k-means) — per the driver contract it
is exercised by pytest recall gates (tests) rather than a SQL oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType

from mismo_spark.ann import cosine_pairs


def _assign_udf(centroids: np.ndarray):
    """pandas UDF: nearest-centroid id by cosine (vectors get L2-
    normalized inside, so argmax dot == argmax cosine)."""
    c = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(IntegerType())
    def assign(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        m = np.stack(v.to_numpy())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ c.T, axis=1).astype("int32"))

    return assign


def _topk_cells_udf(centroids: np.ndarray, n_probe: int):
    """pandas UDF: array of the n_probe nearest centroid ids."""
    from pyspark.sql.types import ArrayType

    c = centroids / np.maximum(
        np.linalg.norm(centroids, axis=1, keepdims=True), 1e-12
    )

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        m = np.stack(v.to_numpy())
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ c.T
        idx = np.argsort(-sims, axis=1)[:, :n_probe].astype("int32")
        return pd.Series(list(idx))

    return probe


def train_centroids(
    corpus: DataFrame,
    *,
    vec_column: str = "embedding",
    id_column: str = "vec_id",
    n_lists: int = 16,
    n_iters: int = 3,
    sample_size: int = 10_000,
    seed: int = 42,
) -> np.ndarray:
    """k-means centroids (n_lists × dim) trained on a deterministic
    hash-ordered sample.  Each Lloyd iteration is one assignment pass
    (pandas UDF) + one posexplode/groupBy average; only k×dim values
    ever reach the driver."""
    v = F.col(vec_column).cast("array<double>")
    sample = (
        corpus.select(F.col(id_column).alias("__id"), v.alias("__v"))
        .withColumn("__h", F.xxhash64("__id", F.lit(seed)))
        .orderBy("__h")
        .limit(sample_size)
        .drop("__h")
    )
    sample = sample.persist()
    try:
        init = sample.orderBy("__id").limit(n_lists).collect()
        centroids = np.array([row["__v"] for row in init], dtype=np.float64)
        for _ in range(n_iters):
            assigned = sample.withColumn(
                "__cell", _assign_udf(centroids)(F.col("__v"))
            )
            means = (
                assigned.select("__cell", F.posexplode("__v"))
                .groupBy("__cell", "pos")
                .agg(F.avg("col").alias("m"))
                .collect()
            )
            new = centroids.copy()  # empty cells keep their centroid
            by_cell: dict[int, list[tuple[int, float]]] = {}
            for row in means:
                by_cell.setdefault(row["__cell"], []).append(
                    (row["pos"], row["m"])
                )
            for cell, vals in by_cell.items():
                vals.sort()
                new[cell] = np.array([m for _, m in vals])
            centroids = new
        return centroids
    finally:
        sample.unpersist()


def ivf_assign(
    corpus: DataFrame,
    centroids: np.ndarray,
    *,
    vec_column: str = "embedding",
    cell_column: str = "cell",
) -> DataFrame:
    """Add the IVF cell id.  Persist/write the result partitioned by
    ``cell_column`` (``.write.partitionBy(cell_column)``) so probes
    become partition pruning."""
    v = F.col(vec_column).cast("array<double>")
    return corpus.withColumn(cell_column, _assign_udf(centroids)(v))


def ivf_topk(
    corpus_indexed: DataFrame,
    queries: DataFrame,
    centroids: np.ndarray,
    *,
    k: int = 10,
    n_probe: int = 4,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    cell_column: str = "cell",
) -> DataFrame:
    """Probe the n_probe nearest cells per query, exact-cosine re-rank
    within the candidates → (query_id, neighbour_id, cosine)."""
    qv = F.col(vec_column).cast("array<double>")
    q = queries.select(
        F.col(id_column).alias("query_id"),
        qv.alias("__qv"),
        F.explode(_topk_cells_udf(centroids, n_probe)(qv)).alias(cell_column),
    )
    c = corpus_indexed.select(
        F.col(id_column).alias("neighbour_id"),
        F.col(vec_column).cast("array<double>").alias("__cv"),
        cell_column,
    )
    scored = (
        c.join(F.broadcast(q), cell_column)
        .filter(F.col("neighbour_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbour_id",
            cosine_pairs(F.col("__qv"), F.col("__cv")).alias("cosine"),
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
