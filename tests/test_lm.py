"""Unigram LM perplexity: golden values vs a Python reference,
self-scoring, foreign-LM unseen tokens, empty docs."""

import math

import pytest

from mismo_spark.textqa.lm import unigram_lm, unigram_perplexity

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the dog sat"),
    (3, ""),
]


def _py_lm(texts, k=1.0):
    counts = {}
    for t in texts:
        for w in t.lower().split():
            counts[w] = counts.get(w, 0) + 1
    total = sum(counts.values())
    vocab = len(counts)
    lm = {
        w: math.log((n + k) / (total + k * (vocab + 1)))
        for w, n in counts.items()
    }
    unseen = math.log(k / (total + k * (vocab + 1)))
    return lm, unseen


def test_lm_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["token"]: r["logp"] for r in unigram_lm(df).collect()}
    want, unseen = _py_lm([t for _, t in DOCS])
    # the LM carries the exact unseen logp as the token-NULL sentinel
    assert got.pop(None) == pytest.approx(unseen, abs=1e-12)
    assert set(got) == set(want)
    for w in want:
        assert got[w] == pytest.approx(want[w], abs=1e-12)


def test_self_perplexity_matches_python(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in unigram_perplexity(df).collect()}
    lm, _ = _py_lm([t for _, t in DOCS])
    for doc_id, text in DOCS:
        toks = text.lower().split()
        if not toks:
            assert rows[doc_id]["n_tokens"] == 0
            assert rows[doc_id]["cross_entropy"] is None
            continue
        ce = -sum(lm[w] for w in toks) / len(toks)
        assert rows[doc_id]["cross_entropy"] == pytest.approx(ce, rel=1e-9)
        assert rows[doc_id]["perplexity"] == pytest.approx(
            math.exp(ce), rel=1e-9
        )
    # common-word doc scores lower perplexity than the rarer-word doc
    assert rows[1]["perplexity"] < rows[2]["perplexity"] * 2


def test_foreign_lm_unseen_tokens(spark):
    train = spark.createDataFrame(DOCS, "doc_id long, text string")
    lm = unigram_lm(train)
    target = spark.createDataFrame(
        [(10, "the zyzzyva sat")], "doc_id long, text string"
    )
    row = unigram_perplexity(target, lm).collect()[0]
    lm_py, unseen = _py_lm([t for _, t in DOCS])
    want_ce = -(lm_py["the"] + unseen + lm_py["sat"]) / 3
    # the sentinel row carries the CLOSED-FORM unseen logp — exact,
    # not a cancellative 1 - sum(exp(logp)) recovery
    assert row["cross_entropy"] == pytest.approx(want_ce, rel=1e-12)


def test_k_validation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        unigram_lm(df, k_smoothing=0)
