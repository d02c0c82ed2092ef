"""Per-cluster embedding centroids and member-outlier scores.

After transitive clustering, an embedding-space sanity check catches
what string comparers miss: a member whose vector sits far from its
cluster's centroid is likely a false merge (the "one dubious bridge"
failure mode seen from the content side).  Feeds the same review queue
as ``cluster/review.py``.

Plan shape — pure column algebra, dimension-bounded state:
  1. centroid: posexplode the vectors to (component, dim, val) rows —
     ONE groupBy(component, dim) average with map-side partial
     aggregation (a 10^8-member cluster contributes dim running sums
     per map task, never raw vectors to one reducer), then a
     per-component rebuild whose collect_list holds exactly ``dim``
     structs — bounded by the embedding width, not the cluster size
  2. member scores: join the (component, centroid) table back (narrow,
     broadcast-able) and score with the HOF cosine — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark.vector import cosine_similarity


def cluster_centroids(
    assignments: DataFrame,
    embeddings: DataFrame,
    *,
    id_col: str = "record_id",
    emb_col: str = "embedding",
    min_size: int = 2,
) -> DataFrame:
    """→ DataFrame(component, n_members, centroid): the elementwise
    mean vector of each component with ≥ ``min_size`` embedded
    members.  Members missing an embedding are ignored."""
    e = embeddings.select(
        F.col(id_col).alias("__eid"), F.col(emb_col).alias("__v")
    )
    m = assignments.join(
        e, F.col("record_id") == F.col("__eid")
    ).select("component", "__v")
    dims = m.select(
        "component", F.posexplode("__v").alias("__d", "__x")
    )
    per_dim = dims.groupBy("component", "__d").agg(
        F.avg("__x").alias("__mean"), F.count(F.lit(1)).alias("__n")
    )
    return (
        per_dim.groupBy("component")
        .agg(
            F.max("__n").alias("n_members"),
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__d"), F.col("__mean")))
                ),
                lambda s: s["__mean"],
            ).alias("centroid"),
        )
        .where(F.col("n_members") >= min_size)
        .select(
            "component",
            F.col("n_members").cast("long").alias("n_members"),
            "centroid",
        )
    )


def embedding_outliers(
    assignments: DataFrame,
    embeddings: DataFrame,
    *,
    id_col: str = "record_id",
    emb_col: str = "embedding",
    min_size: int = 2,
) -> DataFrame:
    """→ DataFrame(record_id, component, cosine_to_centroid): each
    embedded member of a ≥ ``min_size`` cluster scored against its
    cluster centroid — ascending cosine is the review order (the
    member least like its cluster first)."""
    cents = cluster_centroids(
        assignments,
        embeddings,
        id_col=id_col,
        emb_col=emb_col,
        min_size=min_size,
    )
    e = embeddings.select(
        F.col(id_col).alias("__eid"), F.col(emb_col).alias("__v")
    )
    m = assignments.join(
        e, F.col("record_id") == F.col("__eid")
    ).select("record_id", "component", "__v")
    return m.join(cents, "component").select(
        "record_id",
        "component",
        cosine_similarity(F.col("__v"), F.col("centroid")).alias(
            "cosine_to_centroid"
        ),
    )
