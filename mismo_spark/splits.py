"""Deterministic, leakage-safe dataset splits.

Splitting a web corpus row-by-row leaks: near-duplicate documents land
on both sides of a train/test boundary and the test set silently
overlaps training data.  The fix is to split at the DEDUP-CLUSTER
level — every member of a connected component goes to the same split —
which is exactly what the clustering stages of this engine produce.

Both functions hash with md5 (cross-engine, reproducible run-to-run,
independent of partitioning), never ``rand()``: re-running the split
next month with three more documents moves nothing that already had a
split.

Plan shape: the split decision is a projection on the hash key; the
cluster-safe variant adds one narrow join of the (record_id,
component) assignment — broadcast-able at the usual component-table
sizes relative to the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASH_DENOM = float(1 << 32)


def _unit_hash(key: Column, seed: int) -> Column:
    """Deterministic uniform [0, 1) from the md5 of (key, seed)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", key.cast("string"), F.lit(str(seed)))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return h / F.lit(_HASH_DENOM)


def _check_fractions(fractions: dict[str, float]) -> None:
    if not fractions:
        raise ValueError("fractions must be a non-empty dict")
    total = sum(fractions.values())
    if any(v <= 0 for v in fractions.values()) or abs(total - 1.0) > 1e-9:
        raise ValueError(
            f"fractions must be positive and sum to 1.0, got {fractions}"
        )


def assign_splits(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    key_col: str = "record_id",
    seed: int = 42,
    out: str = "split",
) -> DataFrame:
    """→ ``df`` + string column ``out``: each row assigned to a split
    by the md5-uniform hash of its ``key_col`` against the cumulative
    ``fractions`` boundaries.  Deterministic: the same key + seed gets
    the same split in every run, on any cluster, forever."""
    _check_fractions(fractions)
    u = _unit_hash(F.col(key_col), seed)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        expr = (
            F.when(u < acc, F.lit(name))
            if expr is None
            else expr.when(u < acc, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out, expr)


def cluster_safe_splits(
    docs: DataFrame,
    assignments: DataFrame,
    fractions: dict[str, float],
    *,
    id_col: str = "record_id",
    seed: int = 42,
    out: str = "split",
    broadcast_assignments: bool | None = None,
) -> DataFrame:
    """→ ``docs`` + ``component`` + ``out``: the split is decided by
    the md5 hash of the COMPONENT, so every member of a dedup cluster
    lands in the same split — near-duplicates can never straddle a
    train/test boundary.  Documents absent from ``assignments`` are
    treated as their own singleton cluster (hashed by their own id).

    ``broadcast_assignments`` defaults to the byte-gated auto policy.
    """
    _check_fractions(fractions)
    from mismo_spark._util import should_broadcast

    a = assignments.select(
        F.col("record_id").alias("__aid"), "component"
    )
    if broadcast_assignments is None:
        broadcast_assignments = should_broadcast(a)
    if broadcast_assignments:
        a = F.broadcast(a)
    joined = docs.join(
        a, docs[id_col] == F.col("__aid"), "left"
    ).drop("__aid")
    key = F.coalesce(F.col("component"), docs[id_col])
    u = _unit_hash(key, seed)
    expr = None
    acc = 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        expr = (
            F.when(u < acc, F.lit(name))
            if expr is None
            else expr.when(u < acc, F.lit(name))
        )
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return joined.withColumn(out, expr)


def split_leakage_audit(
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "record_id",
    split_col: str = "split",
    broadcast_splits: bool | None = None,
) -> DataFrame:
    """→ one row per (split_l, split_r) with ``n_pairs``: where the
    near-duplicate ``pairs`` (record_id_l, record_id_r) land relative
    to the split boundaries — the pre-ship audit for a train/val/test
    release.  Cross-split rows (split_l != split_r) are LEAKAGE:
    ``cluster_safe_splits`` guarantees zero of them for the pair graph
    its components were built from; a nonzero row means the splits were
    assigned from a different (weaker) blocking than the audit's pairs.

    ``split_l``/``split_r`` are canonicalized (ordered by split name)
    so each unordered boundary appears once.  Plan: two broadcast-gated
    joins of the narrow (id, split) table onto the pairs, one tiny
    groupBy — never materializes anything per-record.
    """
    from mismo_spark._util import should_broadcast

    s = docs.select(F.col(id_col).alias("__sid"), F.col(split_col).alias("__sp"))
    if broadcast_splits is None:
        broadcast_splits = should_broadcast(s)
    if broadcast_splits:
        s = F.broadcast(s)
    tagged = (
        pairs.join(s, pairs["record_id_l"] == F.col("__sid"))
        .select("record_id_r", F.col("__sp").alias("__sl"))
        .join(s, F.col("record_id_r") == F.col("__sid"))
        .select(
            F.least("__sl", "__sp").alias("split_l"),
            F.greatest("__sl", "__sp").alias("split_r"),
        )
    )
    return (
        tagged.groupBy("split_l", "split_r")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .withColumn("leaked", F.col("split_l") != F.col("split_r"))
    )
