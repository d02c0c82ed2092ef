"""One-pass precision/recall threshold sweep."""

from __future__ import annotations

import pytest

from mismo_spark.fs.curve import precision_recall_curve

PAIRS = [
    # (score, is_match)
    (10.0, True),
    (10.0, True),
    (10.0, False),
    (3.0, True),
    (3.0, False),
    (3.0, False),
    (0.5, True),
    (0.5, False),
    (0.5, False),
    (0.5, False),
]


def _brute(pairs):
    out = {}
    for t in sorted({s for s, _ in pairs}, reverse=True):
        tp = sum(1 for s, y in pairs if s >= t and y)
        fp = sum(1 for s, y in pairs if s >= t and not y)
        fn = sum(1 for s, y in pairs if s < t and y)
        prec = tp / (tp + fp)
        rec = tp / (tp + fn) if tp + fn else 0.0
        f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
        out[t] = (tp, fp, fn, prec, rec, f1)
    return out


def test_curve_matches_brute_force(spark):
    df = spark.createDataFrame(PAIRS, "odds double, is_match boolean")
    got = {
        r["threshold"]: (
            r["tp"], r["fp"], r["fn"],
            r["precision"], r["recall"], r["f1"],
        )
        for r in precision_recall_curve(df).collect()
    }
    want = _brute(PAIRS)
    assert set(got) == set(want)
    for t, (tp, fp, fn, prec, rec, f1) in want.items():
        gtp, gfp, gfn, gprec, grec, gf1 = got[t]
        assert (gtp, gfp, gfn) == (tp, fp, fn)
        assert gprec == pytest.approx(prec, abs=1e-6)
        assert grec == pytest.approx(rec, abs=1e-6)
        assert gf1 == pytest.approx(f1, abs=1e-6)


def test_curve_recall_monotone_and_endpoints(spark):
    df = spark.createDataFrame(PAIRS, "odds double, is_match boolean")
    rows = precision_recall_curve(df).orderBy("threshold").collect()
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls, reverse=True)  # threshold asc → recall desc
    assert rows[0]["recall"] == 1.0  # lowest threshold admits every pair
    assert rows[0]["fn"] == 0


def test_curve_binned_scores(spark):
    # continuous scores: quantized into 2 bins, thresholds = bin lower edges
    data = [(0.1, False), (0.2, False), (0.8, True), (0.9, True)]
    df = spark.createDataFrame(data, "odds double, is_match boolean")
    rows = precision_recall_curve(df, n_bins=2).orderBy(
        "threshold", ascending=False
    ).collect()
    assert len(rows) == 2
    hi, lo = rows
    assert (hi["tp"], hi["fp"]) == (2, 0) and hi["precision"] == 1.0
    assert (lo["tp"], lo["fp"], lo["fn"]) == (2, 2, 0)


def test_best_threshold(spark):
    from mismo_spark.fs.curve import best_threshold, precision_recall_curve

    rows = (
        [(10.0, True)] * 8 + [(10.0, False)] * 1
        + [(5.0, True)] * 2 + [(5.0, False)] * 4
        + [(1.0, False)] * 10
    )
    df = spark.createDataFrame(rows, "odds double, is_match boolean")
    curve = precision_recall_curve(df)
    best = best_threshold(curve)
    # F1 at t=10: p=8/9, r=8/10 -> 0.842; at t=5: p=10/15, r=1.0 -> 0.8
    assert best["threshold"] == 10.0
    assert best["fbeta"] == pytest.approx(2 * (8 / 9) * 0.8 / (8 / 9 + 0.8))
    # recall-weighted beta prefers the looser threshold
    best2 = best_threshold(curve, beta=2.0)
    assert best2["threshold"] == 5.0
    with pytest.raises(ValueError, match="beta"):
        best_threshold(curve, beta=0)
