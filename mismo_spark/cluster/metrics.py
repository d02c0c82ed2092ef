"""Cluster metrics.

``degree`` — graph degree per record (mismo/cluster/_metrics.py:28-69).

``pairwise_prf`` — distributed pairwise precision/recall/F1 of predicted
components vs ground-truth labels: the F1 ≥ 0.99 gate.  Computed
WITHOUT materializing any pairs: for cluster sizes n, the number of
intra-cluster pairs is Σ n(n−1)/2, so

    TP       = Σ over (component, label_true) joint groups
    pred_all = Σ over component groups
    true_all = Σ over label_true groups

— three aggregations, no joins of pair tables, which is what survives
when a cluster has 10^6 members.  (sklearn-style ARI/AMI from
mismo/cluster/_eval.py:13-181 are driver-side conveniences at test
scale; see tests.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark.types.linkage import ID_L, ID_R


def degree(links: DataFrame) -> DataFrame:
    """Per-record distinct-neighbour count (mismo/cluster/_metrics.py:28-69)."""
    both = links.select(
        F.col(ID_L).alias("record_id"), F.col(ID_R).alias("neighbour")
    ).unionByName(
        links.select(F.col(ID_R).alias("record_id"), F.col(ID_L).alias("neighbour"))
    )
    return (
        both.distinct()
        .groupBy("record_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def _sum_pairs(df: DataFrame, keys: list[str]) -> int:
    row = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(F.sum(F.col("n") * (F.col("n") - 1) / 2).alias("p"))
        .collect()[0]
    )
    return int(row["p"] or 0)


def pairwise_prf(assignments: DataFrame) -> dict[str, float]:
    """Pairwise precision/recall/F1.

    ``assignments``: DataFrame with columns (record_id, component,
    label_true).  Returns {"precision", "recall", "f1", "tp",
    "pred_pairs", "true_pairs"}.
    """
    tp = _sum_pairs(assignments, ["component", "label_true"])
    pred = _sum_pairs(assignments, ["component"])
    true = _sum_pairs(assignments, ["label_true"])
    precision = tp / pred if pred else 1.0
    recall = tp / true if true else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall)
        else 0.0
    )
    return {
        "precision": precision,
        "recall": recall,
        "f1": f1,
        "tp": float(tp),
        "pred_pairs": float(pred),
        "true_pairs": float(true),
    }
