"""Unsupervised EM training — the agreement-pattern aggregation loop.

Semantics of mismo/fs/_train_em.py:17-93: sample ≤ max_pairs pairs,
compare once and cache, init m uniform / u observed, then 5 fixed
iterations of {score with current weights → split at odds ≥ 10 →
re-estimate m from "matches", u from "non-matches"}.

Spark shape: ONE cluster job total.  Pairs with equal agreement
patterns score identically under any weights, so the per-iteration
(is_match, labels...) histogram is the iteration-INVARIANT joint
pattern histogram split by current per-pattern odds — aggregate the
joint once (``groupBy(dim1, ..., dimK).count()``, ≤ ∏levels rows,
map-side combined) and run init + every EM iteration driver-side (see
``em_from_sample``).  This replaces the reference's 2·K separate
groupBys per iteration with a single job for the whole loop, and
weights re-enter downstream plans as literals, not joins.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
    return em_from_sample(comparers, compared)


def em_from_sample(
    comparers: Sequence[EnumComparer], compared: DataFrame
) -> Weights:
    """ONE cluster job, then EM entirely driver-side.

    Every pair with the same agreement pattern gets the same odds under
    any weights, so each iteration's (is_match, labels...) histogram is
    just the joint pattern histogram split by the current per-pattern
    odds — and the joint histogram is iteration-INVARIANT.  Aggregate
    it once (≤ ∏levels rows) and run init + all iterations on the
    driver: the cluster cost of EM is a single map-side-combined
    groupBy over the sample, independent of iteration count.  The odds
    product is evaluated in the same order with the same IEEE doubles
    as ``score_compared``'s column product, so the resulting weights
    are bit-identical to the per-iteration-job formulation."""
    dims = [c.name for c in comparers]
    joint = [
        dict(r.asDict())
        for r in compared.groupBy(*dims).agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    weights = _initial_weights_from_joint(comparers, joint)
    for _ in range(EM_ITERATIONS):
        hist = []
        for row in joint:
            odds = 1.0
            for c in comparers:
                lev = row[c.name]
                n_levels = len(c.level_names)
                odds *= (
                    weights[c.name].odds(lev)
                    if lev is not None and 0 <= lev < n_levels
                    else float("nan")
                )
            # Spark semantics: NaN compares greater than any number, so
            # a NaN-odds pattern lands on the match side there too
            is_match = bool(odds >= MATCH_ODDS_THRESHOLD) or math.isnan(odds)
            hist.append({**row, "__is_match": is_match})
        weights = _weights_from_histogram(comparers, hist)
    return weights


def _initial_weights(
    comparers: Sequence[EnumComparer], compared: DataFrame
) -> Weights:
    """m uniform 1/K; u = observed label proportions
    (mismo/fs/_train_em.py:60-70) — from one joint histogram job.

    NOT on the production path (``em_from_sample`` supersedes it with
    the single-job joint-histogram formulation): retained as the
    independent oracle for the bit-parity test
    (tests/test_fs_train.py::test_em_from_sample_matches_per_iteration_jobs)
    that guards em_from_sample's 'bit-identical to the
    per-iteration-job formulation' claim."""
    dims = [c.name for c in comparers]
    hist = compared.groupBy(*dims).agg(F.count(F.lit(1)).alias("n")).collect()
    return _initial_weights_from_joint(comparers, hist)


def _initial_weights_from_joint(comparers: Sequence[EnumComparer], hist) -> Weights:
    """m uniform 1/K; u = observed label proportions, from an
    already-collected joint ``(dims..., n)`` histogram — marginalized
    driver-side per dimension, not one ``level_proportions`` job per
    comparer; the joint table is ≤ ∏K rows (tiny), the per-dimension
    smoothing is identical to ``level_proportions`` (add-1 for unseen
    levels)."""
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
