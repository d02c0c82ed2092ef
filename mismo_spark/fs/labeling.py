"""Deterministic pair selection for human labeling — the
active-learning loop around Fellegi-Sunter training.

Labels are most valuable where the model is least sure (probabilities
near the decision boundary) and must cover the whole score range to
estimate m/u without selection bias (Fellegi & Sunter's training
assumes labeled pairs span agreement patterns).  This module picks a
fixed-size, REPRODUCIBLE sample stratified by score band: the same
corpus + seed always yields the same pairs, so labeling queues stay
stable across pipeline re-runs (the same property ``sample_table``'s
hash_filter gives the EM sampler).

Plan shape: band assignment is a projection; per-band selection is one
row_number window partitioned by band ordered by an md5 rank — the
sort is per-band and early-bounded by AQE's window top-k pushdown
(rank ≤ n prunes partitions); nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_pairs_for_labeling(
    scored: DataFrame,
    *,
    n_per_band: int = 20,
    n_bands: int = 10,
    prob_col: str = "match_probability",
    id_l: str = "record_id_l",
    id_r: str = "record_id_r",
    seed: int = 42,
) -> DataFrame:
    """→ up to ``n_bands × n_per_band`` rows of ``scored`` plus
    ``band`` (0..n_bands-1, equi-width over [0, 1]) and ``rank``
    (1..n_per_band within the band).

    Selection within a band is by md5 of (id_l, id_r, seed) — a
    deterministic pseudo-random order that is identical across engines
    and runs, unlike ``rand()``.  Probabilities of exactly 1.0 fall in
    the top band.
    """
    if n_per_band < 1 or n_bands < 1:
        raise ValueError(
            f"n_per_band and n_bands must be >= 1, got {n_per_band}, {n_bands}"
        )
    p = F.col(prob_col)
    band = F.least(
        F.floor(p * n_bands).cast("int"), F.lit(n_bands - 1)
    )
    rank_key = F.md5(
        F.concat_ws("|", F.col(id_l), F.col(id_r), F.lit(str(seed)))
    )
    w = Window.partitionBy("band").orderBy("__rk")
    return (
        scored.where(p.isNotNull())
        .withColumn("band", band)
        .withColumn("__rk", rank_key)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= n_per_band)
        .drop("__rk")
    )
