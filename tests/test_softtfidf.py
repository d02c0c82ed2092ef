"""Soft TF-IDF (mismo_spark/text/softtfidf.py) against a NumPy
reference implementation of Cohen et al. 2003 on a hand-built corpus."""

from __future__ import annotations

import math

import pytest

from mismo_spark.text.similarity import _jaro_winkler
from mismo_spark.text.softtfidf import soft_tfidf, token_weights

CORPUS = {
    0: ["jon", "smith"],
    1: ["john", "smith", "inc"],
    2: ["mary", "jones"],
    3: ["smith", "smith"],  # tf=2 exercises log(tf+1)
}
LINKS = [(0, 1), (0, 2), (1, 3), (2, 3)]


def _ref_weights():
    n = len(CORPUS)
    df = {}
    for toks in CORPUS.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = {}
    for rid, toks in CORPUS.items():
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        raw = {
            t: math.log(c + 1.0) * math.log(n / df[t]) for t, c in tf.items()
        }
        norm = math.sqrt(sum(v * v for v in raw.values()))
        out[rid] = {t: (v / norm if norm else 0.0) for t, v in raw.items()}
    return out


def _ref_soft_tfidf(l, r, threshold=0.9):
    w = _ref_weights()
    total = 0.0
    for tl, wl in w[l].items():
        best = None
        for tr, wr in w[r].items():
            jw = 1.0 if tl == tr else _jaro_winkler(tl, tr)
            if jw >= threshold and (best is None or (jw, wr, tr) > best):
                best = (jw, wr, tr)
        if best is not None:
            total += wl * best[1] * best[0]
    return total


def _dfs(spark):
    recs = spark.createDataFrame(
        [(k, v) for k, v in CORPUS.items()],
        "record_id long, toks array<string>",
    )
    links = spark.createDataFrame(
        LINKS, "record_id_l long, record_id_r long"
    )
    return recs, links


def test_weights_l2_normalized(spark):
    recs, _ = _dfs(spark)
    w = token_weights(recs, "toks")
    norms = {
        r.record_id: r.n
        for r in w.groupBy("record_id")
        .agg(__import__("pyspark").sql.functions.sum(
            __import__("pyspark").sql.functions.col("w") ** 2
        ).alias("n"))
        .collect()
    }
    for rid, n in norms.items():
        assert n == pytest.approx(1.0), rid


def test_matches_reference(spark):
    recs, links = _dfs(spark)
    got = {
        (r.record_id_l, r.record_id_r): r.soft_tfidf
        for r in soft_tfidf(links, recs, "toks").collect()
    }
    assert set(got) == set(LINKS)
    for l, r in LINKS:
        assert got[(l, r)] == pytest.approx(_ref_soft_tfidf(l, r)), (l, r)


def test_unmatched_pair_scores_zero(spark):
    recs, links = _dfs(spark)
    got = {
        (r.record_id_l, r.record_id_r): r.soft_tfidf
        for r in soft_tfidf(links, recs, "toks").collect()
    }
    # jon≈jones (JW .907) makes (0,2) nonzero; (2,3) is truly unmatched:
    # {mary, jones} vs {smith} has no JW≥.9 token pair
    assert got[(2, 3)] == 0.0
    assert got[(0, 2)] > 0.0


def test_typo_token_still_scores(spark):
    recs, links = _dfs(spark)
    got = {
        (r.record_id_l, r.record_id_r): r.soft_tfidf
        for r in soft_tfidf(links, recs, "toks").collect()
    }
    assert got[(0, 1)] > 0.4  # jon≈john + smith exact
