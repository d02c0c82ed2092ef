"""Unsupervised EM training — the agreement-pattern aggregation loop.

Semantics of mismo/fs/_train_em.py:17-93: sample ≤ max_pairs pairs,
compare once and cache, init m uniform / u observed, then 5 fixed
iterations of {score with current weights → split at odds ≥ 10 →
re-estimate m from "matches", u from "non-matches"}.

Spark shape: the compared sample is persisted once (it's the only big
thing).  Each iteration is ONE job: a single
``groupBy(is_match, dim1, ..., dimK).count()`` over the cached sample —
the agreement-pattern histogram — collected to the driver (rows ≤
2·∏levels, small), from which all per-dimension m/u marginals are
computed in Python.  This replaces the reference's 2·K separate
groupBys per iteration with one, and weights re-enter the plan as
literals, not joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from mismo_spark.compare.enum import EnumComparer, compare
from mismo_spark.fs.train import (
    _with_both,
    make_weights,
    sample_all_links,
)
from mismo_spark.fs.weights import Weights

EM_ITERATIONS = 5  # fixed, mismo/fs/_train_em.py:50
MATCH_ODDS_THRESHOLD = 10.0  # mismo/fs/_train_em.py:53-55


def train_using_em(
    comparers: Sequence[EnumComparer],
    left: DataFrame,
    right: DataFrame,
    *,
    max_pairs: int | None = 1_000_000,
    seed: int = 42,
) -> Weights:
    links = sample_all_links(left, right, max_pairs=max_pairs, seed=seed)
    compared = compare(_with_both(left, right, links), comparers).select(
        *[c.name for c in comparers]
    )
    compared = compared.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        weights = _initial_weights(comparers, compared)
        dims = [c.name for c in comparers]
        for _ in range(EM_ITERATIONS):
            scored = weights.score_compared(compared)
            hist = (
                scored.withColumn("__is_match", F.col("odds") >= MATCH_ODDS_THRESHOLD)
                .groupBy("__is_match", *dims)
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            weights = _weights_from_histogram(comparers, hist)
        return weights
    finally:
        compared.unpersist()


def _initial_weights(
    comparers: Sequence[EnumComparer], compared: DataFrame
) -> Weights:
    """m uniform 1/K; u = observed label proportions
    (mismo/fs/_train_em.py:60-70).

    One joint ``groupBy(dims)`` histogram job marginalized driver-side
    per dimension — not one ``level_proportions`` job per comparer; the
    joint table is ≤ ∏K rows (tiny), the per-dimension smoothing is
    identical to ``level_proportions`` (add-1 for unseen levels)."""
    dims = [c.name for c in comparers]
    hist = compared.groupBy(*dims).agg(F.count(F.lit(1)).alias("n")).collect()
    out = []
    for c in comparers:
        n_levels = len(c.level_names)
        counts = {lev: 0 for lev in range(n_levels)}
        for row in hist:
            lev = row[c.name]
            if lev in counts:
                counts[lev] += row["n"]
        for lev in range(n_levels):
            if counts[lev] == 0:
                counts[lev] = 1
        total = sum(counts.values())
        ms = [1.0 / n_levels] * n_levels
        us = [counts[lev] / total for lev in range(n_levels)]
        out.append(make_weights(c, ms, us))
    return Weights(out)


def _weights_from_histogram(comparers: Sequence[EnumComparer], hist) -> Weights:
    """Marginalize the joint (is_match, labels...) histogram into
    per-dimension m/u proportions with the same add-1 smoothing as
    level_proportions (mismo/fs/_train.py:33-40)."""
    out = []
    for c in comparers:
        n_levels = len(c.level_names)
        m_counts = {lev: 0 for lev in range(n_levels)}
        u_counts = {lev: 0 for lev in range(n_levels)}
        for row in hist:
            tgt = m_counts if row["__is_match"] else u_counts
            tgt[row[c.name]] = tgt.get(row[c.name], 0) + row["n"]
        for counts in (m_counts, u_counts):
            for lev in range(n_levels):
                if counts[lev] == 0:
                    counts[lev] = 1
        m_total = sum(m_counts.values())
        u_total = sum(u_counts.values())
        ms = [m_counts[lev] / m_total for lev in range(n_levels)]
        us = [u_counts[lev] / u_total for lev in range(n_levels)]
        out.append(make_weights(c, ms, us))
    return Weights(out)
