"""DSIR (Xie et al. 2023): hashed-n-gram importance resampling.

Covers: feature hashing vs a hashlib reference, the LM sentinel
contract, hand-checked importance weights, empty/null docs, Gumbel
determinism, validation, and full-pipeline parity with a pure-Python
reference implementation (md5 feature hashing + add-α LMs + Gumbel
top-k) on a two-population corpus — including the directional check
that target-like documents dominate the selected set.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from mismo_spark.textqa.dsir import (
    bucket_lm,
    dsir_select,
    gumbel_key,
    hashed_ngrams,
    importance_weights,
)

B = 50  # small bucket space so collisions are exercised


def _py_bucket(gram: str, seed: int = 0, n_buckets: int = B) -> int:
    h = hashlib.md5(f"{gram}:{seed}".encode()).hexdigest()[:8]
    return int(h, 16) % n_buckets


def _py_grams(text: str, n_buckets: int = B, bigrams: bool = True) -> list[int]:
    toks = text.lower().split()
    out = [_py_bucket(t, n_buckets=n_buckets) for t in toks]
    if bigrams:
        out += [
            _py_bucket(f"{a} {b}", n_buckets=n_buckets)
            for a, b in zip(toks, toks[1:])
        ]
    return out


def test_hashed_ngrams_matches_hashlib(spark):
    df = spark.createDataFrame(
        [("the cat sat",), ("one",), ("",), (None,)], "text string"
    )
    got = df.select(
        hashed_ngrams(F.col("text"), n_buckets=B).alias("g")
    ).collect()
    assert got[0]["g"] == _py_grams("the cat sat")
    assert got[1]["g"] == _py_grams("one")  # no bigrams from 1 token
    assert got[2]["g"] == []
    assert got[3]["g"] is None


def test_hashed_ngrams_unigram_only(spark):
    df = spark.createDataFrame([("a b c",)], "text string")
    got = df.select(
        hashed_ngrams(F.col("text"), n_buckets=B, bigrams=False).alias("g")
    ).collect()[0]["g"]
    assert got == _py_grams("a b c", bigrams=False)


def test_bucket_lm_probs_and_sentinel(spark):
    docs = spark.createDataFrame([("x x y",)], "text string")
    lm = {r["bucket"]: r["logp"] for r in bucket_lm(docs, n_buckets=B).collect()}
    # grams: x, x, y, 'x x', 'x y' → 5 total
    bx, by = _py_bucket("x"), _py_bucket("y")
    bxx, bxy = _py_bucket("x x"), _py_bucket("x y")
    assert lm[bx] == pytest.approx(math.log((2 + 1) / (5 + B)))
    assert lm[by] == pytest.approx(math.log((1 + 1) / (5 + B)))
    assert lm[bxx] == pytest.approx(math.log((1 + 1) / (5 + B)))
    assert lm[bxy] == pytest.approx(math.log((1 + 1) / (5 + B)))
    assert lm[None] == pytest.approx(math.log(1 / (5 + B)))  # unseen
    with pytest.raises(ValueError, match="alpha"):
        bucket_lm(docs, alpha=0)


def test_importance_weights_hand_checked(spark):
    target = spark.createDataFrame([(0, "aa aa")], "doc_id long, text string")
    raw = spark.createDataFrame(
        [(0, "aa"), (1, "zz"), (2, ""), (3, None)],
        "doc_id long, text string",
    )
    t_lm = bucket_lm(target, n_buckets=B)
    r_lm = bucket_lm(raw, n_buckets=B)
    got = {
        r["doc_id"]: (r["n_grams"], r["log_weight"])
        for r in importance_weights(raw, t_lm, r_lm, n_buckets=B).collect()
    }
    # target grams: aa×2, 'aa aa' → 3 total; raw grams: aa, zz → 2 total
    baa, bzz = _py_bucket("aa"), _py_bucket("zz")
    lw_aa = math.log((2 + 1) / (3 + B)) - math.log((1 + 1) / (2 + B))
    lw_zz = math.log(1 / (3 + B)) - math.log((1 + 1) / (2 + B))
    assert baa != bzz
    assert got[0] == (1, pytest.approx(lw_aa))
    assert got[1] == (1, pytest.approx(lw_zz))
    assert got[2] == (0, 0.0)  # empty text → no evidence
    assert got[3] == (0, 0.0)  # null text
    assert got[0][1] > got[1][1]  # target-like beats target-unlike


def test_gumbel_key_deterministic_finite(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = df.select(gumbel_key(F.col("doc_id")).alias("g")).collect()
    b = df.select(gumbel_key(F.col("doc_id")).alias("g")).collect()
    assert [r["g"] for r in a] == [r["g"] for r in b]
    assert all(math.isfinite(r["g"]) for r in a)
    # different seed → different noise
    c = df.select(gumbel_key(F.col("doc_id"), seed=7).alias("g")).collect()
    assert [r["g"] for r in c] != [r["g"] for r in a]


def _py_dsir(raw_rows, target_rows, k, n_buckets=B, gumbel_seed=42):
    """Pure-Python reference of the full dsir_select."""

    def lm(rows):
        counts: dict[int, int] = {}
        total = 0
        for _, text in rows:
            if text is None:
                continue
            for g in _py_grams(text, n_buckets):
                counts[g] = counts.get(g, 0) + 1
                total += 1
        denom = total + n_buckets
        return (
            {b: math.log((n + 1) / denom) for b, n in counts.items()},
            math.log(1 / denom),
        )

    t_lm, t_un = lm(target_rows)
    r_lm, r_un = lm(raw_rows)
    out = []
    for did, text in raw_rows:
        lw = 0.0
        if text is not None:
            for g in _py_grams(text, n_buckets):
                lw += t_lm.get(g, t_un) - r_lm.get(g, r_un)
        h = int(
            hashlib.md5(f"{did}|{gumbel_seed}".encode()).hexdigest()[:8], 16
        )
        u = (h + 1) / (2**32 + 1)
        out.append((did, lw, lw + -math.log(-math.log(u))))
    out.sort(key=lambda x: (-x[2], x[0]))
    return out[:k]


def test_dsir_select_matches_python_reference(spark):
    # two populations: A-docs share target's vocabulary, Z-docs don't
    a_words = ["alpha", "beta", "gamma", "delta"]
    z_words = ["zork", "yagg", "xulu", "womp"]
    raw_rows = []
    for i in range(60):
        ws = a_words if i % 2 == 0 else z_words
        raw_rows.append(
            (i, " ".join(ws[(i + j) % 4] for j in range(6)))
        )
    target_rows = [
        (1000 + i, " ".join(a_words[(i + j) % 4] for j in range(5)))
        for i in range(10)
    ]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(target_rows, "doc_id long, text string")
    got = dsir_select(raw, target, k=15, n_buckets=B).collect()
    exp = _py_dsir(raw_rows, target_rows, k=15)
    assert [r["doc_id"] for r in got] == [e[0] for e in exp]
    for r, e in zip(got, exp):
        assert r["log_weight"] == pytest.approx(e[1])
        assert r["key"] == pytest.approx(e[2])
    # directional: the selected set is dominated by target-like A-docs
    n_a = sum(1 for r in got if r["doc_id"] % 2 == 0)
    assert n_a >= 12
    with pytest.raises(ValueError, match="k must be"):
        dsir_select(raw, target, k=0)
