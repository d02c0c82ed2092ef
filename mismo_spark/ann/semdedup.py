"""SemDeDup — semantic deduplication via centroid cells (Abbas et al.
2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication").

The embedding-space sibling of MinHash near-dup for *paraphrase*-level
duplicates that share no shingles: partition the corpus into k centroid
cells (k-means Voronoi cells — the same geometry as the IVF index),
compute exact pairwise cosine ONLY within a cell, connect pairs above
``min_cosine`` into duplicate groups, and keep one representative per
group.  The paper's keep rule is deliberately anti-centroid: keep the
member with the LOWEST cosine to its cluster centroid ("keeping
outliers" preserved downstream accuracy best — §4.1), exposed here as
``keep="low_centroid_sim"`` (default) / ``"high_centroid_sim"``.

Spark-first plan shape (the 100 TB story):
* the candidate self-join exchanges ONLY (id, cell) rows — one cell per
  record (no explode, no band duplication), so shuffle volume is
  |corpus| 12-byte rows and the join is an equi-join on ``cell``, never
  all-pairs;
* vectors join back ONCE onto the candidate pairs for the exact-cosine
  recheck (broadcast-gated by estimated bytes, same policy as
  ``embedding_near_duplicates``);
* the grouping is connected components over the dup pairs — within-cell
  by construction, so components converge in very few rounds;
* ``max_cell_size`` is the skew guard for degenerate corpora where one
  cell would go quadratic (drops the over-full cell's pairs, documented
  recall tradeoff, off by default).

Determinism / oracle replay: with ``seed_centroids`` (the k lowest-id
vectors — zero Lloyd iterations) the ENTIRE operator is replayable in
ANSI SQL from the input table alone: the DuckDB oracle re-derives the
centroids with ORDER BY/LIMIT, assigns cells with an argmax-cosine
window, and replays pairs + connected components (recursive CTE) + the
keep rule.  With ``mismo_spark.ann.ivf.train_centroids`` (iterative
k-means) the operator is deterministic but not SQL-expressible — the
pytest recall/identity gates cover that path, per the driver contract.
Cosine parity note: Spark scores with a numpy matmul, the oracle with
sequential ``list_dot_product`` — they differ at ~1e-15, inside the
6-dp harness rounding; an argmax cell assignment could flip only if two
centroids are equidistant to ~1e-15 (same documented fragility as
``hyperplane_buckets``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

from mismo_spark.ann import cosine_pairs


def seed_centroids(
    df: DataFrame,
    k: int,
    *,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
) -> np.ndarray:
    """(k × dim) float64 centroids = the embeddings of the k lowest
    ids.  Zero Lloyd iterations: deterministic, engine-independent, and
    cheap (one ORDER BY/LIMIT k) — the SQL-replayable centroid source
    for oracle-checked runs and a reasonable spread-out init when the
    id order is uncorrelated with embedding geometry.  Production runs
    wanting real Voronoi cells use ``ann.ivf.train_centroids``."""
    rows = (
        df.select(id_column, F.col(vec_column).cast("array<double>"))
        .filter(F.col(vec_column).isNotNull())
        .orderBy(id_column)
        .limit(k)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"need at least {k} non-null vectors, got {len(rows)}")
    return np.stack([np.asarray(r[1], dtype=np.float64) for r in rows])


def _assign_with_cos_udf(centroids: np.ndarray):
    """pandas UDF → struct<cell:int, cent_cos:double>: the argmax-cosine
    centroid id (ties → lowest cell, numpy argmax picks the first) and
    the cosine to it.  One matmul per Arrow batch; k×dim is closed over
    (tiny — it fits in every executor by construction).

    NULL and ZERO-NORM vectors get cell NULL and cent_cos NULL — the
    same convention as ``cosine_pairs`` (a zero vector has no
    direction, so no nearest cell), never NaN (NaN compares false,
    poisons averages, and sorts ABOVE real cosines under F.desc)."""
    cn = np.sqrt(np.einsum("ij,ij->i", centroids, centroids))

    @F.pandas_udf(
        StructType(
            [
                StructField("cell", IntegerType()),
                StructField("cent_cos", DoubleType()),
            ]
        )
    )
    def assign(v: pd.Series) -> pd.DataFrame:
        n = len(v)
        cells = np.full(n, -1, dtype="int32")
        coss = np.full(n, np.nan)
        vals = v.to_numpy()
        valid = np.array([x is not None for x in vals], dtype=bool)
        if valid.any():
            m = np.stack(vals[valid]).astype(np.float64)
            mn = np.sqrt(np.einsum("ij,ij->i", m, m))
            denom = mn[:, None] * cn[None, :]
            with np.errstate(invalid="ignore", divide="ignore"):
                cos = np.where(denom == 0, np.nan, (m @ centroids.T) / denom)
            best = np.argmax(np.nan_to_num(cos, nan=-np.inf), axis=1)
            cells[valid] = best.astype("int32")
            coss[valid] = cos[np.arange(len(best)), best]
            # zero-norm rows resolved to NaN cosine → treat as invalid
            zero = np.flatnonzero(valid)[np.isnan(coss[valid])]
            valid[zero] = False
        out = pd.DataFrame({"cell": cells, "cent_cos": coss})
        out.loc[~valid, "cell"] = None
        out.loc[~valid, "cent_cos"] = None
        return out

    return assign


def assign_cells(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    vec_column: str = "embedding",
    cell_column: str = "cell",
    cos_column: str = "cent_cos",
) -> DataFrame:
    """df + (cell:int, cent_cos:double): nearest centroid by cosine and
    the cosine to it.  The cell column is the natural partition/bucket
    key for a stored corpus (same layout contract as ``ivf_assign``)."""
    s = _assign_with_cos_udf(centroids)(
        F.col(vec_column).cast("array<double>")
    )
    return df.withColumn("__a", s).select(
        "*", F.col("__a.cell").alias(cell_column),
        F.col("__a.cent_cos").alias(cos_column),
    ).drop("__a")


def semantic_dup_pairs(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    min_cosine: float = 0.95,
    max_cell_size: int | None = None,
    broadcast_vectors: bool | None = None,
    broadcast_max_bytes: int = 512 << 20,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """→ (id_l, id_r, cell, cosine) with id_l < id_r: within-cell pairs
    whose exact cosine ≥ ``min_cosine``.

    Slim-exchange shape: the self-join moves (id, cell) rows only;
    vectors come back via ONE broadcast-gated join per side for the
    ``cosine_pairs`` recheck.

    ``assigned`` (optional): a precomputed (id_column, cell) DataFrame
    from :func:`assign_cells` with the SAME centroids — lets callers
    that already materialized the assignment (``semdedup``, or a corpus
    stored partitioned by cell) skip a second full matmul pass over the
    vectors."""
    v = F.col(vec_column).cast("array<double>")
    if assigned is None:
        assigned = assign_cells(
            df.select(F.col(id_column).alias("__id"), v.alias("__v")),
            centroids,
            vec_column="__v",
            cell_column="__cell",
            cos_column="__cc",
        ).select("__id", "__cell")
    else:
        assigned = assigned.select(
            F.col(id_column).alias("__id"), F.col("cell").alias("__cell")
        )
    if max_cell_size is not None:
        w = Window.partitionBy("__cell")
        assigned = assigned.withColumn(
            "__csz", F.count(F.lit(1)).over(w)
        ).filter(F.col("__csz") <= max_cell_size).drop("__csz")
    left = assigned.select(F.col("__id").alias("id_l"), "__cell")
    right = assigned.select(F.col("__id").alias("id_r"), "__cell")
    # one cell per record ⇒ each (l, r) pair appears at most once: no
    # dropDuplicates shuffle needed (unlike banded LSH)
    cands = (
        left.join(right, "__cell")
        .filter(F.col("id_l") < F.col("id_r"))
        .select("id_l", "id_r", F.col("__cell").alias("cell"))
    )
    from mismo_spark._util import should_broadcast

    vecs = df.select(F.col(id_column).alias("__vid"), v.alias("__v"))
    if broadcast_vectors is None:
        broadcast_vectors = should_broadcast(vecs, max_bytes=broadcast_max_bytes)
    if broadcast_vectors:
        vecs = F.broadcast(vecs)
    pairs = (
        cands.join(vecs, cands["id_l"] == vecs["__vid"])
        .select("id_l", "id_r", "cell", F.col("__v").alias("__vl"))
        .join(vecs, F.col("id_r") == vecs["__vid"])
        .select("id_l", "id_r", "cell", "__vl", F.col("__v").alias("__vr"))
    )
    return pairs.select(
        "id_l",
        "id_r",
        "cell",
        cosine_pairs(F.col("__vl"), F.col("__vr")).alias("cosine"),
    ).filter(F.col("cosine") >= min_cosine)


def semdedup(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    min_cosine: float = 0.95,
    keep: str = "low_centroid_sim",
    max_cell_size: int | None = None,
    broadcast_vectors: bool | None = None,
    broadcast_max_bytes: int = 512 << 20,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """→ (``id_column``, cell, cent_cos, component, keep): every input
    record with its duplicate-group id and a boolean ``keep`` flag —
    exactly one kept member per group (singletons keep their row).
    Ids must be unique: a duplicated id never pairs with itself
    (id_l < id_r), but its extra assignment rows would each get their
    own rank in the keep window — one marked keep=False despite having
    no duplicate.

    ``keep="low_centroid_sim"`` is the paper's rule (the member LEAST
    like its centroid survives — §4.1's best-performing variant);
    ``"high_centroid_sim"`` keeps the most central member.  Ties break
    on the id, so the flag is deterministic.

    ``assigned`` (optional): a precomputed
    :func:`assign_cells` output (id_column, cell, cent_cos) for these
    exact centroids — pass it (persisted) to manage caching yourself.
    When omitted, the internally computed assignment is persisted (it
    feeds BOTH the keep rule and the pairing — two full matmul corpus
    passes otherwise) and stays cached until the application releases
    it; long multi-stage jobs should prefer the ``assigned=`` form and
    unpersist after materializing the result."""
    if keep not in ("low_centroid_sim", "high_centroid_sim"):
        raise ValueError(
            "keep must be 'low_centroid_sim' or 'high_centroid_sim', "
            f"got {keep!r}"
        )
    from mismo_spark.cluster.cc import connected_components

    if assigned is None:
        assigned = assign_cells(
            df, centroids, vec_column=vec_column,
            cell_column="cell", cos_column="cent_cos",
        ).select(id_column, "cell", "cent_cos")
        assigned = assigned.persist()
    else:
        assigned = assigned.select(id_column, "cell", "cent_cos")
    pairs = semantic_dup_pairs(
        df,
        centroids,
        id_column=id_column,
        vec_column=vec_column,
        min_cosine=min_cosine,
        max_cell_size=max_cell_size,
        broadcast_vectors=broadcast_vectors,
        broadcast_max_bytes=broadcast_max_bytes,
        assigned=assigned.select(id_column, "cell"),
    )
    comps = connected_components(
        pairs.select(
            F.col("id_l").alias("record_id_l"),
            F.col("id_r").alias("record_id_r"),
        ),
        assigned.select(F.col(id_column).alias("record_id")),
    )
    order = (
        F.asc("cent_cos") if keep == "low_centroid_sim" else F.desc("cent_cos")
    )
    w = Window.partitionBy("component").orderBy(order, F.asc(id_column))
    return (
        assigned.join(
            comps.withColumnRenamed("record_id", id_column), id_column
        )
        .withColumn("__rn", F.row_number().over(w))
        .select(
            id_column,
            "cell",
            "cent_cos",
            "component",
            (F.col("__rn") == 1).alias("keep"),
        )
    )
