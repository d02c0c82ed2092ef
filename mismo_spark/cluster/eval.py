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


def rand_score(assignments: DataFrame) -> float:
    """Plain Rand index (mismo/cluster/_eval.py:157-169,
    sklearn.metrics.rand_score): fraction of agreeing pairs,
    RI = (comb2(n) + 2·Σcomb2(m_ij) − Σcomb2(a_i) − Σcomb2(b_j))
         / comb2(n)."""
    true, pred = _to_label_arrays(assignments)
    m = _contingency(true, pred).astype(float)
    n = float(len(true))
    total = n * (n - 1) / 2.0
    if total == 0:
        return 1.0
    sum_comb = _comb2(m).sum()
    sum_a = _comb2(m.sum(axis=1)).sum()
    sum_b = _comb2(m.sum(axis=0)).sum()
    return float((total + 2.0 * sum_comb - sum_a - sum_b) / total)


def mutual_info_score(assignments: DataFrame) -> float:
    """Raw MI in nats (mismo/cluster/_eval.py:122-133,
    sklearn.metrics.mutual_info_score)."""
    true, pred = _to_label_arrays(assignments)
    return float(_mutual_info(_contingency(true, pred)))


def _expected_mutual_info(m: np.ndarray) -> float:
    """E[MI] under the permutation model (Vinh, Epps & Bailey 2010,
    JMLR 11 — the same hypergeometric expectation as sklearn's
    ``expected_mutual_information``): for each (row-sum a_i, col-sum
    b_j) the overlap n_ij ranges over its hypergeometric support and
    contributes (n_ij/N)·ln(N·n_ij/(a_i·b_j)) weighted by the
    hypergeometric pmf, evaluated via log-gamma."""
    rows = m.sum(axis=1).astype(np.int64)
    cols = m.sum(axis=0).astype(np.int64)
    n = int(m.sum())
    if n == 0:
        return 0.0
    lg = math.lgamma
    emi = 0.0
    for a in rows:
        a = int(a)
        for b in cols:
            b = int(b)
            lo = max(1, a + b - n)
            hi = min(a, b)
            for nij in range(lo, hi + 1):
                term = (nij / n) * math.log(n * nij / (a * b))
                log_p = (
                    lg(a + 1)
                    + lg(b + 1)
                    + lg(n - a + 1)
                    + lg(n - b + 1)
                    - lg(n + 1)
                    - lg(nij + 1)
                    - lg(a - nij + 1)
                    - lg(b - nij + 1)
                    - lg(n - a - b + nij + 1)
                )
                emi += term * math.exp(log_p)
    return emi


def adjusted_mutual_info(
    assignments: DataFrame, *, average_method: str = "arithmetic"
) -> float:
    """AMI (mismo/cluster/_eval.py:13-32,
    sklearn.metrics.adjusted_mutual_info_score):
    (MI − E[MI]) / (avg(H_true, H_pred) − E[MI]), chance-corrected so a
    random clustering scores ~0 regardless of cluster counts.  E[MI] is
    a driver-side double loop over the contingency marginals —
    test-scale like the reference's sklearn delegation (the
    distributed, any-scale metric remains
    cluster/metrics.pairwise_prf)."""
    true, pred = _to_label_arrays(assignments)
    m = _contingency(true, pred)
    mi = _mutual_info(m)
    emi = _expected_mutual_info(m)
    h_true = _entropy(m.sum(axis=1))
    h_pred = _entropy(m.sum(axis=0))
    if average_method == "arithmetic":
        norm = (h_true + h_pred) / 2.0
    elif average_method == "geometric":
        norm = math.sqrt(h_true * h_pred)
    elif average_method == "min":
        norm = min(h_true, h_pred)
    elif average_method == "max":
        norm = max(h_true, h_pred)
    else:
        raise ValueError(f"unknown average_method: {average_method}")
    denom = norm - emi
    if denom == 0:
        return 1.0
    # sklearn guards tiny negative denominators the same way
    if denom < 0:
        denom = min(denom, -np.finfo(np.float64).eps)
    else:
        denom = max(denom, np.finfo(np.float64).eps)
    return float((mi - emi) / denom)


def homogeneity_score(assignments: DataFrame) -> float:
    """mismo/cluster/_eval.py:76-87 (sklearn.metrics.homogeneity_score)."""
    return homogeneity_completeness_v(assignments)["homogeneity"]


def completeness_score(assignments: DataFrame) -> float:
    """mismo/cluster/_eval.py:62-73 (sklearn.metrics.completeness_score)."""
    return homogeneity_completeness_v(assignments)["completeness"]


def v_measure_score(assignments: DataFrame) -> float:
    """mismo/cluster/_eval.py:90-101 (sklearn.metrics.v_measure_score)."""
    return homogeneity_completeness_v(assignments)["v_measure"]
