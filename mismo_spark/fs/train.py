"""Weight estimation from labels / true pairs / random sampling.

Semantics of mismo/fs/_train.py:17-268.  All estimators reduce to the
same primitive: ``level_proportions`` — a groupBy-count over agreement
labels, collected to the driver (K = #levels, tiny) with add-1
smoothing for unseen levels (mismo/fs/_train.py:33-40: a level never
seen among matches would give odds 0, never seen among non-matches
odds ∞).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import sample_table
from mismo_spark.compare.enum import EnumComparer, compare
from mismo_spark.fs.weights import ComparerWeights, LevelWeights, Weights
from mismo_spark.types.linkage import ID_L, ID_R


def level_proportions(labels: DataFrame, comparer: EnumComparer) -> list[float]:
    """Proportion of rows at each agreement level, add-1-smoothed for
    unseen levels (mismo/fs/_train.py:17-41).  One shuffle
    (partial-aggregated groupBy), K-row collect."""
    counts = {
        r["level"]: r["n"]
        for r in labels.groupBy(F.col(comparer.name).alias("level"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_levels = len(comparer.level_names)
    for lev in range(n_levels):
        counts.setdefault(lev, 1)
    total = sum(counts[lev] for lev in range(n_levels))
    return [counts[lev] / total for lev in range(n_levels)]


def make_weights(
    comparer: EnumComparer, ms: Sequence[float], us: Sequence[float]
) -> ComparerWeights:
    return ComparerWeights(
        comparer.name,
        [
            LevelWeights(name, m=m, u=u)
            for name, m, u in zip(comparer.level_names, ms, us)
        ],
    )


def sample_all_links(
    left: DataFrame, right: DataFrame, *, max_pairs: int | None = None, seed: int = 42
) -> DataFrame:
    """~Uniform random sample of (record_id_l, record_id_r) pairs
    (mismo/linkage/_sample.py:11-117).

    The reference loops topping up random index pairs; at Spark scale we
    instead hash-sample ~sqrt(max_pairs) ids from each side and cross
    them — deterministic (seeded xxhash64 ordering), produces ≤
    max_pairs pairs, and the cross join is bounded so the slow-join
    guard doesn't apply.
    """
    li = left.select(F.col("record_id").alias(ID_L))
    ri = right.select(F.col("record_id").alias(ID_R))
    if max_pairs is not None:
        import math

        n_side = max(1, int(math.isqrt(max_pairs)))
        li = sample_table(li, n_side, seed=seed)
        ri = sample_table(ri, n_side, seed=seed + 1)
    out = li.crossJoin(ri).filter(F.col(ID_L) != F.col(ID_R))
    if max_pairs is not None:
        out = out.limit(max_pairs)
    return out


def _with_both(left: DataFrame, right: DataFrame, links: DataFrame) -> DataFrame:
    from mismo_spark.types.linkage import Linkage

    return Linkage(left, right, links).links_with_both()


def _train_us_using_sampling(
    comparers: Sequence[EnumComparer],
    left: DataFrame,
    right: DataFrame,
    *,
    max_pairs: int,
    seed: int = 42,
) -> dict[str, list[float]]:
    """u = level proportions among (almost surely non-matching) random
    pairs (mismo/fs/_train.py:44-76, after splink)."""
    pairs = sample_all_links(left, right, max_pairs=max_pairs, seed=seed)
    compared = compare(_with_both(left, right, pairs), comparers)
    return {c.name: level_proportions(compared, c) for c in comparers}


def _train_ms_from_pairs(
    comparers: Sequence[EnumComparer],
    left: DataFrame,
    right: DataFrame,
    true_pairs: DataFrame,
    *,
    max_pairs: int,
    seed: int = 42,
) -> dict[str, list[float]]:
    """m = level proportions among known true pairs
    (mismo/fs/_train.py:79-115)."""
    sample = sample_table(true_pairs.select(ID_L, ID_R), max_pairs, seed=seed)
    compared = compare(_with_both(left, right, sample), comparers)
    return {c.name: level_proportions(compared, c) for c in comparers}


def _true_pairs_from_labels(left: DataFrame, right: DataFrame) -> DataFrame:
    """Equi-join on label_true → true pairs (mismo/fs/_train.py:166-175)."""
    for df, side in ((left, "left"), (right, "right")):
        if "label_true" not in df.columns:
            raise ValueError(f"{side} dataset must have a label_true column")
    l = left.select(F.col("record_id").alias(ID_L), F.col("label_true").alias("__lt"))
    r = right.select(F.col("record_id").alias(ID_R), F.col("label_true").alias("__lt"))
    pairs = l.join(r, "__lt", "inner").select(ID_L, ID_R)
    if left is right:
        pairs = pairs.filter(F.col(ID_L) < F.col(ID_R))
    else:
        pairs = pairs.filter(F.col(ID_L) != F.col(ID_R))
    return pairs


def train_using_pairs(
    comparers: Sequence[EnumComparer],
    left: DataFrame,
    right: DataFrame,
    *,
    true_pairs: DataFrame,
    max_pairs: int = 1_000_000,
    seed: int = 42,
) -> Weights:
    """m from provided true pairs, u from random sampling
    (mismo/fs/_train.py:178-223)."""
    ms = _train_ms_from_pairs(comparers, left, right, true_pairs, max_pairs=max_pairs, seed=seed)
    us = _train_us_using_sampling(comparers, left, right, max_pairs=max_pairs, seed=seed)
    return Weights([make_weights(c, ms[c.name], us[c.name]) for c in comparers])


def train_using_labels(
    comparers: Sequence[EnumComparer],
    left: DataFrame,
    right: DataFrame,
    *,
    max_pairs: int = 1_000_000,
    seed: int = 42,
) -> Weights:
    """m from label_true equi-join, u from random sampling
    (mismo/fs/_train.py:226-268)."""
    true_pairs = _true_pairs_from_labels(left, right)
    return train_using_pairs(
        comparers, left, right, true_pairs=true_pairs, max_pairs=max_pairs, seed=seed
    )
