"""Term-frequency adjustments to Fellegi-Sunter match weights — the
Splink-style refinement (Fellegi & Sunter 1969 §3.3.1 "frequency-based
weights"; splink's `tf_adjustments`).

A trained u-probability for an exact-match level is the AVERAGE chance
of two random records agreeing on the field.  But agreeing on "smith"
is weak evidence and agreeing on "zabrinsky" strong: the chance of
coincidental agreement on a specific value v is its relative frequency
f_v, not the field-wide u.  The adjustment replaces the generic
Bayes factor m/u with the value-specific m/f_v by multiplying the
level's odds by (u / f_v) ** tf_weight:

  * tf_weight = 1.0  — full Fellegi-Sunter frequency correction
  * tf_weight  in (0, 1) — damped (splink's tf_adjustment_weight)
  * min_frequency floors f_v so a singleton value cannot claim an
    unbounded boost from sampling noise.

Pure column algebra over the already-scored pair projection — the
frequency column rides in from ``mismo_spark.tf.add_frequencies`` on
the RECORD table (one broadcast-able stats join before pair
generation), so no new pair-sized shuffle is introduced.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark.fs.weights import ComparerWeights, Weights


def _level_index(cw: ComparerWeights, level: str | int) -> int:
    if isinstance(level, int):
        return level
    for i, lw in enumerate(cw.level_weights):
        if lw.name == level:
            return i
    raise KeyError(level)


def tf_adjustment_column(
    cw: ComparerWeights,
    label_col: Column,
    freq_col: Column,
    *,
    level: str | int = "exact",
    tf_weight: float = 1.0,
    min_frequency: float = 1e-6,
) -> Column:
    """→ multiplicative odds adjustment: (u / f) ** tf_weight on rows
    at ``level`` with a known frequency, 1.0 everywhere else.  A level
    with u == 0 is never adjusted (its odds are already infinite)."""
    if not 0.0 <= tf_weight <= 1.0:
        raise ValueError(f"tf_weight must be in [0, 1], got {tf_weight}")
    idx = _level_index(cw, level)
    u = cw.level_weights[idx].u
    if u == 0 or tf_weight == 0:
        return F.lit(1.0)
    f = F.greatest(freq_col, F.lit(float(min_frequency)))
    factor = F.pow(F.lit(float(u)) / f, F.lit(float(tf_weight)))
    return F.when(
        (label_col == idx) & freq_col.isNotNull(), factor
    ).otherwise(F.lit(1.0))


def score_compared_tf(
    weights: Weights,
    compared: DataFrame,
    adjustments: dict[str, Column | str],
    *,
    level: str | int = "exact",
    tf_weight: float = 1.0,
    min_frequency: float = 1e-6,
) -> DataFrame:
    """``Weights.score_compared`` with per-value term-frequency
    adjustments: for each comparer name in ``adjustments``, the odds of
    its ``level`` rows are multiplied by (u / f) ** tf_weight, where f
    comes from the given frequency column (typically
    ``F.greatest(col_frequency_l, col_frequency_r)`` after
    ``add_frequencies`` on the record table).

    Adds `{dim}_odds` (adjusted), `odds`, `match_probability`,
    `log_odds` — same contract and the SAME scoring loop as the
    unadjusted scorer (``weights._score_compared``), so the two cannot
    drift.  Every ``adjustments`` key must name a comparer — a typo'd
    key would otherwise silently produce unadjusted scores.
    """
    from mismo_spark.fs.weights import _score_compared

    names = {cw.name for cw in weights}
    unknown = sorted(set(adjustments) - names)
    if unknown:
        raise ValueError(
            f"adjustments name unknown comparer(s) {unknown}; "
            f"weights have {sorted(names)}"
        )

    def _adjust(cw, odds):
        if cw.name not in adjustments:
            return odds
        fc = adjustments[cw.name]
        fc = F.col(fc) if isinstance(fc, str) else fc
        return odds * tf_adjustment_column(
            cw,
            F.col(cw.name),
            fc,
            level=level,
            tf_weight=tf_weight,
            min_frequency=min_frequency,
        )

    return _score_compared(weights, compared, odds_adjust=_adjust)


def expected_u_from_frequencies(stats: DataFrame) -> DataFrame:
    """→ one-row DataFrame(u): the exact-level u-probability implied by
    the value distribution, Σ f_v² over ``mismo_spark.tf.value_stats``
    output — the consistency check that trained u and the TF table
    agree (F&S 1969 eq. 3.17; one aggregation)."""
    return stats.agg(
        F.sum(F.col("frequency") * F.col("frequency")).alias("u")
    )
