"""SoftTFIDF (Cohen et al. 2003): golden values vs a pure-Python
reference, identity/empty edges, determinism of the argmax tie-break."""

import math

import pytest

from mismo_spark.text.similarity import _jaro_winkler
from mismo_spark.text.soft_tfidf import (
    soft_tfidf_pairs,
    soft_tfidf_symmetric,
    tfidf_weights,
)

RECORDS = [
    (1, ["john", "smith", "llc"]),
    (2, ["jon", "smith", "llc"]),
    (3, ["acme", "corp"]),
    (4, ["acme", "corp"]),
    (5, []),
]
PAIRS = [(1, 2), (3, 4), (1, 3), (1, 5)]


def _py_weights(records):
    n = len(records)
    df = {}
    for _, toks in records:
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    out = {}
    for rid, toks in records:
        tf = {}
        for t in toks:
            tf[t] = tf.get(t, 0) + 1
        raw = {
            t: (1.0 + math.log(c)) * math.log(n / df[t]) for t, c in tf.items()
        }
        nrm = math.sqrt(sum(v * v for v in raw.values()))
        out[rid] = {t: (v / nrm if nrm > 0 else 0.0) for t, v in raw.items()}
    return out


def _py_soft_tfidf(l, r, weights, theta):
    wl, wr = weights[l], weights[r]
    score = 0.0
    for w, vl in wl.items():
        if not wr:
            continue
        bjw = max(_jaro_winkler(w, u) for u in wr)
        if bjw >= theta:
            u = min(x for x in wr if _jaro_winkler(w, x) == bjw)
            score += vl * wr[u] * bjw
    return score


def test_weights_l2_normalized(spark):
    recs = spark.createDataFrame(
        RECORDS, "record_id long, tokens array<string>"
    )
    w = tfidf_weights(recs).collect()
    norms = {}
    for r in w:
        norms[r["record_id"]] = norms.get(r["record_id"], 0.0) + r["v"] ** 2
    for rid, sq in norms.items():
        assert sq == pytest.approx(1.0, abs=1e-9), rid


def test_matches_python_reference(spark):
    recs = spark.createDataFrame(
        RECORDS, "record_id long, tokens array<string>"
    )
    pairs = spark.createDataFrame(
        PAIRS, "record_id_l long, record_id_r long"
    )
    got = {
        (r["record_id_l"], r["record_id_r"]): r["soft_tfidf"]
        for r in soft_tfidf_pairs(pairs, recs, threshold=0.9).collect()
    }
    weights = _py_weights(RECORDS)
    for l, r in PAIRS:
        want = _py_soft_tfidf(l, r, weights, 0.9)
        assert got[(l, r)] == pytest.approx(want, abs=1e-9), (l, r)
    assert got[(3, 4)] == pytest.approx(1.0, abs=1e-9)  # identical records
    assert got[(1, 3)] == 0.0  # nothing within threshold
    assert got[(1, 5)] == 0.0  # empty right side
    # john~jon + smith + llc all match -> high but < 1.0
    assert 0.8 < got[(1, 2)] < 1.0


def test_symmetric_is_mean(spark):
    recs = spark.createDataFrame(
        RECORDS, "record_id long, tokens array<string>"
    )
    pairs = spark.createDataFrame(
        [(1, 2)], "record_id_l long, record_id_r long"
    )
    f = soft_tfidf_pairs(pairs, recs, threshold=0.9).collect()[0]["soft_tfidf"]
    flipped = spark.createDataFrame(
        [(2, 1)], "record_id_l long, record_id_r long"
    )
    b = soft_tfidf_pairs(flipped, recs, threshold=0.9).collect()[0][
        "soft_tfidf"
    ]
    s = soft_tfidf_symmetric(pairs, recs, threshold=0.9).collect()[0][
        "soft_tfidf"
    ]
    assert s == pytest.approx((f + b) / 2, abs=1e-12)


def test_threshold_validation(spark):
    recs = spark.createDataFrame(
        RECORDS, "record_id long, tokens array<string>"
    )
    pairs = spark.createDataFrame(
        [(1, 2)], "record_id_l long, record_id_r long"
    )
    with pytest.raises(ValueError):
        soft_tfidf_pairs(pairs, recs, threshold=0.0)
