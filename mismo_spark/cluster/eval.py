"""Clustering evaluation metrics.

Semantics of mismo/cluster/_eval.py:13-181, which delegates to sklearn
on driver-collected label arrays.  sklearn isn't available here, so the
same quantities are computed directly in numpy from the pair-confusion/
contingency formulation — identical definitions, test-scale only
(the distributed, any-scale metric is cluster/metrics.pairwise_prf).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame


def _to_label_arrays(assignments: DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """(record_id, component, label_true) → aligned int code arrays
    (mismo/cluster/_eval.py:171-181)."""
    rows = assignments.select("component", "label_true").collect()
    pred = np.array([hash(r["component"]) for r in rows])
    true = np.array([hash(r["label_true"]) for r in rows])
    _, pred = np.unique(pred, return_inverse=True)
    _, true = np.unique(true, return_inverse=True)
    return true, pred


def _contingency(true: np.ndarray, pred: np.ndarray) -> np.ndarray:
    n_t = true.max() + 1 if len(true) else 0
    n_p = pred.max() + 1 if len(pred) else 0
    m = np.zeros((n_t, n_p), dtype=np.int64)
    np.add.at(m, (true, pred), 1)
    return m


def _comb2(x: np.ndarray) -> np.ndarray:
    return x * (x - 1) / 2.0


def adjusted_rand_score(assignments: DataFrame) -> float:
    """ARI (mismo/cluster/_eval.py, sklearn.metrics.adjusted_rand_score)."""
    true, pred = _to_label_arrays(assignments)
    m = _contingency(true, pred)
    n = len(true)
    sum_comb = _comb2(m.astype(float)).sum()
    sum_a = _comb2(m.sum(axis=1).astype(float)).sum()
    sum_b = _comb2(m.sum(axis=0).astype(float)).sum()
    total = _comb2(np.array(float(n)))
    expected = sum_a * sum_b / total if total else 0.0
    max_index = (sum_a + sum_b) / 2.0
    if max_index == expected:
        return 1.0
    return float((sum_comb - expected) / (max_index - expected))


def _entropy(counts: np.ndarray) -> float:
    p = counts[counts > 0].astype(float)
    p = p / p.sum()
    return float(-(p * np.log(p)).sum())


def _mutual_info(m: np.ndarray) -> float:
    n = m.sum()
    mi = 0.0
    rows = m.sum(axis=1)
    cols = m.sum(axis=0)
    for i in range(m.shape[0]):
        for j in range(m.shape[1]):
            if m[i, j] > 0:
                mi += (m[i, j] / n) * math.log(n * m[i, j] / (rows[i] * cols[j]))
    return mi


def homogeneity_completeness_v(assignments: DataFrame) -> dict[str, float]:
    """sklearn-equivalent homogeneity/completeness/V-measure."""
    true, pred = _to_label_arrays(assignments)
    m = _contingency(true, pred)
    h_true = _entropy(m.sum(axis=1))
    h_pred = _entropy(m.sum(axis=0))
    mi = _mutual_info(m)
    homogeneity = mi / h_true if h_true else 1.0
    completeness = mi / h_pred if h_pred else 1.0
    v = (
        2 * homogeneity * completeness / (homogeneity + completeness)
        if (homogeneity + completeness)
        else 0.0
    )
    return {
        "homogeneity": float(homogeneity),
        "completeness": float(completeness),
        "v_measure": float(v),
    }


def normalized_mutual_info(assignments: DataFrame) -> float:
    """NMI with arithmetic averaging (sklearn default)."""
    true, pred = _to_label_arrays(assignments)
    m = _contingency(true, pred)
    h_true = _entropy(m.sum(axis=1))
    h_pred = _entropy(m.sum(axis=0))
    mi = _mutual_info(m)
    denom = (h_true + h_pred) / 2.0
    return float(mi / denom) if denom else 1.0


def fowlkes_mallows(assignments: DataFrame) -> float:
    """FM = TP / sqrt((TP+FP)(TP+FN)) over pairs."""
    true, pred = _to_label_arrays(assignments)
    m = _contingency(true, pred).astype(float)
    tp = _comb2(m).sum()
    pred_pairs = _comb2(m.sum(axis=0)).sum()
    true_pairs = _comb2(m.sum(axis=1)).sum()
    if pred_pairs == 0 or true_pairs == 0:
        return 0.0
    return float(tp / math.sqrt(pred_pairs * true_pairs))
