"""Precision/recall curve over scored labeled pairs — one pass.

The naive formulation ("for each threshold, filter and count") rescans
the pair table once per threshold; a global `row_number` cumsum instead
funnels every pair through ONE partition.  This does neither:

  1. groupBy(score) with map-side partial aggregation collapses the
     (possibly trillion-row) scored-pair table to one row per DISTINCT
     score.  For Fellegi–Sunter that is at most the number of agreement
     patterns (``prod(len(levels)) <= 2^k`` for k binary comparers) —
     tiny by construction, independent of corpus size.
  2. The cumulative window then runs over that tiny table; the single
     partition it implies holds #distinct-scores rows, not #pairs.

For continuous scores (e.g. cosine), pass ``n_bins`` to quantize into
equi-width bins first so step 1 still collapses; thresholds are then bin
lower edges (a conservative, documented approximation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mismo_spark._util import bind_one


def precision_recall_curve(
    scored: DataFrame,
    *,
    score: str = "odds",
    label: str = "is_match",
    n_bins: int | None = None,
) -> DataFrame:
    """One row per candidate threshold, sorted descending:
    (threshold, tp, fp, fn, precision, recall, f1) where tp/fp count
    pairs with score >= threshold and fn the positives below it.

    ``label`` must be boolean (or 0/1); ``score`` numeric.  Predicting
    "match" at threshold t means score >= t, so the top row (highest
    threshold) is the most precise / least complete operating point.
    """
    s = bind_one(scored, score).cast("double")
    y = bind_one(scored, label).cast("boolean")
    if n_bins is not None:
        lo, hi = scored.select(
            F.min(s).alias("lo"), F.max(s).alias("hi")
        ).first()
        if lo is None:
            raise ValueError("no scored pairs")
        width = (float(hi) - float(lo)) / int(n_bins) or 1.0
        bin_idx = F.least(
            F.floor((s - F.lit(float(lo))) / F.lit(width)).cast("int"),
            F.lit(int(n_bins) - 1),
        )
        s = (F.lit(float(lo)) + bin_idx.cast("double") * F.lit(width))
    per_score = scored.select(s.alias("threshold"), y.alias("__y")).groupBy(
        "threshold"
    ).agg(
        F.sum(F.when(F.col("__y"), 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(F.col("__y"), 0).otherwise(1)).alias("n_neg"),
    )
    w = Window.orderBy(F.col("threshold").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total_pos = F.sum("n_pos").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = per_score.select(
        "threshold",
        F.sum("n_pos").over(w).alias("tp"),
        F.sum("n_neg").over(w).alias("fp"),
        (total_pos - F.sum("n_pos").over(w)).alias("fn"),
    )
    prec = F.col("tp") / (F.col("tp") + F.col("fp"))
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.col("tp") / (F.col("tp") + F.col("fn")),
    ).otherwise(F.lit(0.0))
    f1 = F.when(
        (prec + rec) > 0, 2.0 * prec * rec / (prec + rec)
    ).otherwise(F.lit(0.0))
    return cum.select(
        "threshold",
        "tp",
        "fp",
        "fn",
        F.round(prec, 6).alias("precision"),
        F.round(rec, 6).alias("recall"),
        F.round(f1, 6).alias("f1"),
    )


def best_threshold(
    curve: DataFrame,
    *,
    beta: float = 1.0,
) -> dict:
    """→ the operating point maximizing F-beta over a
    :func:`precision_recall_curve` result, as a plain dict
    (threshold, precision, recall, fbeta, tp, fp, fn) — the
    one-call answer to "where do I set the odds cutoff?".

    beta < 1 weights precision (conservative merges for golden
    records); beta > 1 weights recall (candidate generation for human
    review).  Ties take the HIGHEST threshold (fewest predicted
    matches at equal quality).  The curve has one row per distinct
    score (or bin), so the argmax is a tiny driver-side reduction, not
    a corpus pass."""
    if beta <= 0:
        raise ValueError(f"beta must be > 0, got {beta}")
    b2 = float(beta) * float(beta)
    num = (1.0 + b2) * F.col("precision") * F.col("recall")
    den = b2 * F.col("precision") + F.col("recall")
    scored = curve.select(
        "threshold", "tp", "fp", "fn", "precision", "recall",
        F.when(den > 0, num / den).otherwise(F.lit(0.0)).alias("fbeta"),
    )
    row = scored.orderBy(F.desc("fbeta"), F.desc("threshold")).first()
    if row is None:
        raise ValueError("empty curve")
    return {k: row[k] for k in
            ("threshold", "precision", "recall", "fbeta", "tp", "fp", "fn")}
