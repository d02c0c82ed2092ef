"""Blocking-quality metrics: reduction ratio, pairs completeness,
pairs quality.

The standard candidate-generation scorecard (Christen, "Data Matching",
ch. 7) for any Linker's output against a labeled true-pair set:

* reduction ratio      1 - |candidates| / n_naive — how much of the
                       all-pairs product the blocker pruned
                       (n_naive per mismo/_n_naive.py:9-33 semantics)
* pairs completeness   |candidates ∩ true| / |true| — recall of the
                       blocking stage (the F1 ceiling for the whole
                       pipeline: a match never blocked is never scored)
* pairs quality        |candidates ∩ true| / |candidates| — precision
                       of the blocking stage

Plan shape: pairs are canonicalized (dedupe task: unordered) and
DISTINCT-ed, the overlap is one equi-join on the pair key, and the
three counts collapse to one-row aggregates combined with 1x1 cross
joins — everything stays a lazy DataFrame, nothing is collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark.types.linkage import ID_L, ID_R


def _canon(pairs: DataFrame, task: str) -> DataFrame:
    if task == "dedupe":
        return pairs.select(
            F.least(ID_L, ID_R).alias(ID_L),
            F.greatest(ID_L, ID_R).alias(ID_R),
        ).distinct()
    return pairs.select(ID_L, ID_R).distinct()


def blocking_metrics(
    links: DataFrame,
    true_pairs: DataFrame,
    *,
    n_left: int,
    n_right: int | None = None,
    task: str = "dedupe",
) -> DataFrame:
    """One-row DataFrame: (n_naive, n_candidates, n_true, n_found,
    reduction_ratio, pairs_completeness, pairs_quality).

    ``task='dedupe'`` treats pairs as unordered over one table of
    ``n_left`` records (n_naive = n(n-1)/2); ``task='link'`` as ordered
    over two tables (n_naive = n_left * n_right).  Ratios are 6-dp
    rounded; empty candidate/true sets yield 0.0 rather than dividing
    by zero.
    """
    if task not in ("dedupe", "link"):
        raise ValueError(f"task must be 'dedupe' or 'link', got {task!r}")
    if task == "link" and n_right is None:
        raise ValueError("task='link' requires n_right")
    n_naive = (
        n_left * (n_left - 1) // 2 if task == "dedupe" else n_left * n_right
    )
    # materialize the canonical pair sets once: each feeds a count AND
    # the found-join, and behind `links` sits the scheme's whole
    # blocking pipeline — re-executed per consumer otherwise
    cand = _canon(links, task).localCheckpoint(eager=True)
    true = _canon(true_pairs, task).localCheckpoint(eager=True)
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    n_true = true.agg(F.count(F.lit(1)).alias("n_true"))
    n_found = cand.join(true, [ID_L, ID_R]).agg(
        F.count(F.lit(1)).alias("n_found")
    )
    row = n_cand.crossJoin(n_true).crossJoin(n_found)

    def ratio(num, den):
        return F.when(
            den > 0, F.round(num.cast("double") / den, 6)
        ).otherwise(F.lit(0.0))

    return row.select(
        F.lit(n_naive).cast("long").alias("n_naive"),
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_true").cast("long").alias("n_true"),
        F.col("n_found").cast("long").alias("n_found"),
        ratio(
            F.lit(n_naive) - F.col("n_candidates"), F.lit(n_naive)
        ).alias("reduction_ratio"),
        ratio(F.col("n_found"), F.col("n_true")).alias("pairs_completeness"),
        ratio(F.col("n_found"), F.col("n_candidates")).alias("pairs_quality"),
    )


def compare_blocking_schemes(
    schemes: dict[str, DataFrame],
    true_pairs: DataFrame,
    *,
    n_left: int,
    n_right: int | None = None,
    task: str = "dedupe",
) -> DataFrame:
    """Scheme-selection scorecard: one row per candidate blocking
    scheme — (scheme, n_naive, n_candidates, n_true, n_found,
    reduction_ratio, pairs_completeness, pairs_quality) — against one
    labeled true-pair set.

    ``schemes`` maps a name to that scheme's candidate links (the
    ``.links`` of any Linker output).  Each scheme contributes one
    one-row aggregate (the same plan as ``blocking_metrics``); the
    rows are unioned lazily, so evaluating k schemes is k independent
    count-aggregates — no cross-scheme shuffle, trivially parallel,
    and the true-pair side is re-broadcast per scheme by AQE at these
    cardinalities.  This is the "try several keys, pick the cheapest
    one that keeps completeness" loop from Christen ch. 7 as a single
    DataFrame.
    """
    if not schemes:
        raise ValueError("schemes must be a non-empty dict")
    out: DataFrame | None = None
    for name, links in schemes.items():
        row = blocking_metrics(
            links, true_pairs, n_left=n_left, n_right=n_right, task=task
        ).select(F.lit(name).alias("scheme"), "*")
        out = row if out is None else out.unionByName(row)
    return out
