"""Training-mix composition: quota and token-budget sampling.

After curation the corpus is still lopsided — a handful of hot domains
dominate, and language sizes differ by orders of magnitude.  Training
mixes are specified the other way around: "at most N pages per domain",
"B tokens of each language".  Both are one window pass here, and both
are DETERMINISTIC (md5-hash order, not ``rand()``), so the mix is
reproducible run-to-run and audit-able row-by-row.

Scale notes: each function is a single window partitioned by the
group — no global sort, no collect.  ``top_k_per_group`` rides
Spark's rank-limit pushdown (WindowGroupLimit), so partitions prune to
k rows map-side before the shuffle; the budget scan's cumulative sum
is per-group sequential state, the same shape as sessionization.
A mega-group (one domain with 10^9 pages) is bounded map-side by the
pushdown for quotas; for budgets it degrades to that group's sort —
cap it first with ``top_k_per_group`` if a single group can exceed
executor memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _hash_order(id_col: str, seed: int) -> Column:
    return F.md5(F.concat_ws("|", F.col(id_col), F.lit(str(seed))))


def top_k_per_group(
    df: DataFrame,
    group_cols: list[str],
    *,
    k: int,
    order_by: list[Column] | None = None,
    id_col: str = "record_id",
    seed: int = 42,
) -> DataFrame:
    """→ at most ``k`` rows per group.  ``order_by`` picks WHICH rows
    survive (e.g. ``[F.col("quality").desc()]`` keeps the best); the
    deterministic md5 hash of ``id_col`` breaks all remaining ties, so
    the result is stable without any true randomness.  Adds nothing,
    drops nothing else."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    order = list(order_by or []) + [_hash_order(id_col, seed)]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def token_budget_sample(
    df: DataFrame,
    budget: int,
    *,
    by: list[str] | None = None,
    token_col: str = "n_tokens",
    id_col: str = "record_id",
    seed: int = 42,
) -> DataFrame:
    """→ the rows that fill a token ``budget`` per group (or globally
    when ``by`` is None): documents are taken in deterministic md5
    order until the running token total reaches the budget; the
    document that CROSSES the boundary is included (so every group
    with enough material reaches ≥ budget tokens).  Adds
    ``tokens_before`` — the group's running total before this row —
    for audit.

    Note the global form uses one partition for the cumulative sum —
    fine for driver-side corpus assembly at millions of rows; pass
    ``by`` (e.g. ["lang"]) to parallelize by group at corpus scale.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    part = Window.partitionBy(*by) if by else Window.partitionBy()
    w = part.orderBy(_hash_order(id_col, seed)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    before = F.coalesce(
        F.sum(F.col(token_col)).over(w), F.lit(0)
    ).cast("long")
    return (
        df.withColumn("tokens_before", before)
        .where(F.col("tokens_before") < budget)
    )


def temperature_sample(
    df: DataFrame,
    group_cols: list[str],
    *,
    total: int,
    alpha: float,
    id_col: str = "record_id",
    seed: int = 42,
    order_by: list[Column] | None = None,
) -> DataFrame:
    """→ ~``total`` rows with group sizes rebalanced by temperature:
    group g's allocation ∝ n_g^alpha (multilingual temperature
    sampling — Conneau & Lample 2019 / the T5 mixing rule with
    alpha = 1/T).  alpha = 1 keeps natural proportions; alpha → 0
    flattens toward uniform — the standard lever for keeping
    low-resource languages/domains alive in a training mix.

    Allocation is exact largest-remainder apportionment over the
    GROUP-COUNTS table (one row per group, so its single-partition
    remainder-rank window is bounded by #groups, never corpus-sized):
    floor the ideal shares, hand the remaining seats to the largest
    remainders (ties: group name order).  A group's allocation is
    capped at its size — when a flat alpha asks a tiny group for more
    rows than it has, the result undershoots ``total`` rather than
    silently re-inflating big groups (single-pass, auditable; re-run
    with a larger ``total`` if exact fill matters more than the mix).

    WITHIN each group, ``order_by`` picks the survivors (md5-hash
    tie-broken, like ``top_k_per_group``); default pure md5 order.
    Ideal shares are rounded to 6 dp before flooring so the
    apportionment replays identically across engines (pow() may differ
    in the last ulp between libm implementations).

    Output adds ``n_group`` (the group's original size) and
    ``n_target`` (its allocation) for audit.
    """
    if total < 1:
        raise ValueError(f"total must be >= 1, got {total}")
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    counts = df.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n_group"))
    wsum = counts.agg(
        F.sum(F.pow(F.col("n_group").cast("double"), F.lit(alpha))).alias(
            "__wsum"
        )
    )
    ideal = counts.crossJoin(F.broadcast(wsum)).select(
        *group_cols,
        "n_group",
        F.round(
            F.lit(float(total))
            * F.pow(F.col("n_group").cast("double"), F.lit(alpha))
            / F.col("__wsum"),
            6,
        ).alias("__ideal"),
    )
    base = ideal.withColumn(
        "__base", F.floor("__ideal").cast("long")
    ).withColumn("__rem", F.col("__ideal") - F.col("__base"))
    # seats left after flooring; remainder rank over the #groups table
    w_all = Window.partitionBy()
    w_rank = Window.partitionBy().orderBy(
        F.desc("__rem"), *[F.asc(c) for c in group_cols]
    )
    alloc = (
        base.withColumn(
            "__deficit", F.lit(total) - F.sum("__base").over(w_all)
        )
        .withColumn("__rk", F.row_number().over(w_rank))
        .select(
            *group_cols,
            "n_group",
            F.least(
                F.col("__base")
                + (F.col("__rk") <= F.col("__deficit")).cast("long"),
                F.col("n_group"),
            ).alias("n_target"),
        )
    )
    order = list(order_by or []) + [_hash_order(id_col, seed)]
    w_sel = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.join(F.broadcast(alloc), group_cols)
        .withColumn("__rn", F.row_number().over(w_sel))
        .where(F.col("__rn") <= F.col("n_target"))
        .drop("__rn")
    )
