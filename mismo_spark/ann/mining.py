"""Contrastive triplet mining — (anchor, positive, hard negative) over
an embedding corpus, the training-pair generator for contrastive /
metric-learning fine-tunes (SimCSE/E5-style: positives from a
duplicate relation, hard negatives from the nearest NON-duplicates).

No reference counterpart — this is the training-data side of the
engine, composing machinery that already exists:

* **positives** come from a caller-supplied duplicate-pair relation
  (minhash near-dups, embedding near-dups, labeled matches …) — per
  anchor, the HIGHEST-cosine partner;
* **hard-negative candidates** come from the seeded hyperplane-LSH
  buckets (``ann.hyperplane_buckets``): same-bucket neighbours are by
  construction the high-cosine region where the hardest negatives
  live, without an all-pairs product;
* candidates that are duplicate partners (either direction) or the
  anchor itself are anti-joined away, then the top-cosine survivor per
  anchor wins.

Plan shape at 10^12 vectors: the bucket self-join exchanges ONLY
(id, bucket) rows (never vectors, same as embedding_near_duplicates);
vectors join back once per side onto the deduped candidate pairs
under the broadcast byte gate; every argmax is a groupBy
``min(struct(-cosine, id))`` — a hash aggregation with map-side
partial combine, never a per-anchor window sort.

Determinism: seeded hyperplanes + total-order tie-breaks
(higher cosine first, then smaller partner id), so the emitted
triplets are stable across runs, partitionings and engines — the
DuckDB oracle replays the hyperplanes as SQL literals and the same
argmax.  Degenerate partners (zero-norm or NULL embeddings, whose
cosine is NULL) are DROPPED before the argmax — without the filter a
NULL cosine would sort FIRST under min(struct(-cosine, id)) and a
broken vector would beat every real candidate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import should_broadcast
from mismo_spark.ann import cosine_pairs, hyperplane_buckets


def _argmax_partner(
    scored: DataFrame, anchor: str, partner: str, out_partner: str, out_cos: str
) -> DataFrame:
    """Per anchor: the highest-cosine partner, ties to the smallest
    partner id — one hash aggregation (min of a (-cosine, id) struct).
    NULL cosines (zero-norm/null embeddings) are dropped first: NULL
    sorts FIRST under an ascending struct min, so an unfiltered
    degenerate partner would otherwise always win."""
    return (
        scored.where(F.col("cosine").isNotNull())
        .groupBy(anchor)
        .agg(
            F.min(
                F.struct(
                    (-F.col("cosine")).alias("__nc"), F.col(partner).alias("__p")
                )
            ).alias("__best")
        )
        .select(
            anchor,
            F.col("__best.__p").alias(out_partner),
            (-F.col("__best.__nc")).alias(out_cos),
        )
    )


def contrastive_triplets(
    embeddings: DataFrame,
    dup_pairs: DataFrame,
    *,
    id_column: str = "vec_id",
    vec_column: str = "embedding",
    dim: int | None = None,
    n_bands: int = 8,
    band_bits: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = None,
    broadcast_max_bytes: int = 512 << 20,
) -> DataFrame:
    """→ (anchor_id, positive_id, pos_cosine, negative_id, neg_cosine).

    One row per anchor that has BOTH a duplicate partner (positive) and
    at least one non-duplicate same-bucket neighbour (hard negative).
    ``dup_pairs`` needs columns (id_l, id_r); both orientations count
    as duplicates.  ``max_bucket_size`` drops degenerate buckets before
    pairing (same recall-tradeoff skew guard as
    ``embedding_near_duplicates``)."""
    if dim is None:
        first = embeddings.select(vec_column).where(
            F.col(vec_column).isNotNull()
        ).first()
        if first is None:
            raise ValueError(
                f"cannot infer dim: no non-null {vec_column!r} values"
            )
        dim = len(first[0])
    v = F.col(vec_column).cast("array<double>")
    vecs = embeddings.select(F.col(id_column).alias("__vid"), v.alias("__v"))
    if should_broadcast(vecs, max_bytes=broadcast_max_bytes):
        vecs = F.broadcast(vecs)

    def _with_cosine(pairs: DataFrame, a: str, b: str) -> DataFrame:
        return (
            pairs.join(vecs, pairs[a] == vecs["__vid"])
            .select(a, b, F.col("__v").alias("__va"))
            .join(vecs, F.col(b) == vecs["__vid"])
            .select(
                a, b, cosine_pairs(F.col("__va"), F.col("__v")).alias("cosine")
            )
        )

    # -- positives: best duplicate partner per anchor ---------------------
    # explode, not a two-orientation union: a union references the
    # dup_pairs plan twice and Spark re-executes it — behind it can sit
    # a whole near-dup pipeline (its own bucket join + cosine UDF)
    sym = dup_pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_l").alias("anchor_id"),
                    F.col("id_r").alias("partner_id"),
                ),
                F.struct(
                    F.col("id_r").alias("anchor_id"),
                    F.col("id_l").alias("partner_id"),
                ),
            )
        ).alias("__e")
    ).select("__e.anchor_id", "__e.partner_id")
    # ...and materialize: sym feeds the positive scoring AND the
    # negative anti-join, so the (id, id) rows are checkpointed once
    sym = sym.localCheckpoint(eager=True)
    positives = _argmax_partner(
        _with_cosine(sym, "anchor_id", "partner_id"),
        "anchor_id",
        "partner_id",
        "positive_id",
        "pos_cosine",
    )

    # -- hard negatives: best same-bucket NON-duplicate per anchor --------
    keyed = embeddings.select(
        F.col(id_column).alias("__id"),
        F.explode(
            hyperplane_buckets(
                v, dim=dim, n_bands=n_bands, band_bits=band_bits, seed=seed
            )
        ).alias("__bucket"),
    )
    if max_bucket_size is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("__bucket")
        keyed = keyed.withColumn("__bsz", F.count(F.lit(1)).over(w)).filter(
            F.col("__bsz") <= max_bucket_size
        )
    # materialize (id, bucket) once — same rationale as
    # embedding_near_duplicates: under a broadcast-hash plan the
    # aliased self-join would run the Arrow hyperplane UDF twice
    keyed = keyed.localCheckpoint(eager=True)
    left = keyed.select(F.col("__id").alias("anchor_id"), "__bucket")
    right = keyed.select(F.col("__id").alias("cand_id"), "__bucket")
    cands = (
        left.join(right, "__bucket")
        .filter(F.col("anchor_id") != F.col("cand_id"))
        .select("anchor_id", "cand_id")
        .dropDuplicates(["anchor_id", "cand_id"])
        # not a duplicate partner in either direction
        .join(
            sym.withColumnRenamed("partner_id", "cand_id"),
            ["anchor_id", "cand_id"],
            "left_anti",
        )
    )
    negatives = _argmax_partner(
        _with_cosine(cands, "anchor_id", "cand_id"),
        "anchor_id",
        "cand_id",
        "negative_id",
        "neg_cosine",
    )

    return positives.join(negatives, "anchor_id").select(
        "anchor_id",
        "positive_id",
        F.round("pos_cosine", 9).alias("pos_cosine"),
        "negative_id",
        F.round("neg_cosine", 9).alias("neg_cosine"),
    )
