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
    """Per-record distinct-neighbour count (mismo/cluster/_metrics.py:28-69).

    Symmetrized via explode, not a two-orientation union — a union
    would reference (and re-execute) the links plan twice."""
    both = links.select(
        F.explode(
            F.array(
                F.struct(F.col(ID_L).alias("record_id"), F.col(ID_R).alias("neighbour")),
                F.struct(F.col(ID_R).alias("record_id"), F.col(ID_L).alias("neighbour")),
            )
        ).alias("__e")
    ).select("__e.record_id", "__e.neighbour")
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


def bcubed_prf(assignments: DataFrame) -> dict[str, float]:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998) — the other
    standard ER clustering metric next to pairwise F1 (beyond the
    reference, which ships only sklearn-style driver-side scores).

    Per record r with predicted cluster C(r) and true class T(r):
    P(r) = |C(r)∩T(r)| / |C(r)|, R(r) = |C(r)∩T(r)| / |T(r)|; the
    scores are the means over records.  Computed WITHOUT per-record
    work: every record in joint cell (c, t) with overlap o = |c∩t|
    shares P = o/|c| and R = o/|t|, so

        precision = Σ_cells o² / |c|  ÷ N
        recall    = Σ_cells o² / |t|  ÷ N

    — one joint groupBy, two size groupBys, two slim joins on the
    (small) cell table.  Survives 10⁶-member clusters like
    pairwise_prf.
    """
    cells = assignments.groupBy("component", "label_true").agg(
        F.count(F.lit(1)).alias("__o")
    )
    csize = assignments.groupBy("component").agg(
        F.count(F.lit(1)).alias("__nc")
    )
    tsize = assignments.groupBy("label_true").agg(
        F.count(F.lit(1)).alias("__nt")
    )
    row = (
        cells.join(csize, "component")
        .join(tsize, "label_true")
        .agg(
            F.sum(F.col("__o") * F.col("__o") / F.col("__nc")).alias("p"),
            F.sum(F.col("__o") * F.col("__o") / F.col("__nt")).alias("r"),
            F.sum("__o").alias("n"),
        )
        .collect()[0]
    )
    n = row["n"] or 0
    precision = (row["p"] / n) if n else 1.0
    recall = (row["r"] / n) if n else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if (precision + recall)
        else 0.0
    )
    return {"precision": precision, "recall": recall, "f1": f1, "n": float(n)}
