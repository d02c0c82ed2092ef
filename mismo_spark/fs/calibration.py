"""Calibration diagnostics for Fellegi–Sunter match probabilities.

Beyond the reference: FS m/u estimates (especially EM-trained ones)
produce probabilities that rank well but are often miscalibrated; the
reliability curve (binned predicted probability vs observed match
fraction — Zadrozny & Elkan 2002, sklearn's ``calibration_curve``) and
the Brier / log-loss summaries are the standard checks before a
probability threshold is promised to downstream consumers.

Plan shape: everything collapses to a ≤ ``n_bins``-row (or one-row)
aggregate in a single shuffle with map-side combine — the pair table is
scanned once, nothing pair-sized ever reaches the driver or a window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def calibration_curve(
    scored: DataFrame,
    *,
    probability: str = "match_probability",
    label: str = "is_match",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram data: equal-width probability bins with the
    mean predicted probability, observed match fraction, and count.

    → (bin, p_lo, p_hi, n_pairs, mean_predicted, fraction_matched),
    bin = floor(p · n_bins) clamped so p = 1.0 lands in the top bin
    (sklearn ``calibration_curve(strategy='uniform')`` semantics)."""
    p = F.col(probability)
    y = F.col(label).cast("double")
    b = F.least(
        F.floor(p * F.lit(float(n_bins))).cast("long"),
        F.lit(int(n_bins - 1)),
    )
    return (
        scored.select(b.alias("bin"), p.alias("__p"), y.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.avg("__p").alias("mean_predicted"),
            F.avg("__y").alias("fraction_matched"),
        )
        .select(
            "bin",
            (F.col("bin") / F.lit(float(n_bins))).alias("p_lo"),
            ((F.col("bin") + 1) / F.lit(float(n_bins))).alias("p_hi"),
            "n_pairs",
            "mean_predicted",
            "fraction_matched",
        )
        .orderBy("bin")
    )


def brier_score(
    scored: DataFrame,
    *,
    probability: str = "match_probability",
    label: str = "is_match",
) -> float:
    """Mean squared error of the predicted probability — one row."""
    p = F.col(probability)
    y = F.col(label).cast("double")
    row = scored.agg(F.avg((p - y) * (p - y)).alias("b")).collect()[0]
    return float(row["b"])


def log_loss(
    scored: DataFrame,
    *,
    probability: str = "match_probability",
    label: str = "is_match",
    eps: float = 1e-15,
) -> float:
    """Mean negative log-likelihood, probabilities clamped to
    [eps, 1−eps] (sklearn convention) — one row."""
    p = F.least(
        F.greatest(F.col(probability), F.lit(eps)), F.lit(1.0 - eps)
    )
    y = F.col(label).cast("double")
    row = scored.agg(
        F.avg(-(y * F.log(p) + (1.0 - y) * F.log(1.0 - p))).alias("ll")
    ).collect()[0]
    return float(row["ll"])
