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


def _py_bigram(texts):
    c12, c1 = {}, {}
    for t in texts:
        toks = t.lower().split()
        for a, b in zip(toks, toks[1:]):
            c12[(a, b)] = c12.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    return {k: math.log(n / c1[k[0]]) for k, n in c12.items()}


def test_bigram_lm_matches_python(spark):
    from mismo_spark.textqa.lm import bigram_lm

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["token_l"], r["token_r"]): r["logp"]
        for r in bigram_lm(df).collect()
    }
    want = _py_bigram([t for _, t in DOCS])
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # 'the cat' seen once of the 3 'the ...' continuations
    assert got[("the", "cat")] == pytest.approx(math.log(1 / 3))


def test_bigram_perplexity_stupid_backoff(spark):
    from mismo_spark.textqa.lm import bigram_perplexity

    ALPHA = 0.4
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in bigram_perplexity(df).collect()}
    uni, unseen = _py_lm([t for _, t in DOCS])
    big = _py_bigram([t for _, t in DOCS])
    for doc_id, text in DOCS:
        toks = text.lower().split()
        if not toks:
            assert rows[doc_id]["n_tokens"] == 0
            assert rows[doc_id]["cross_entropy"] is None
            continue
        lps = [uni[toks[0]]]  # first token: unigram, no penalty
        for a, b in zip(toks, toks[1:]):
            lps.append(
                big[(a, b)]
                if (a, b) in big
                else math.log(ALPHA) + uni.get(b, unseen)
            )
        ce = -sum(lps) / len(lps)
        assert rows[doc_id]["n_tokens"] == len(toks)
        assert rows[doc_id]["cross_entropy"] == pytest.approx(ce, rel=1e-9)


def test_bigram_perplexity_foreign_lm_and_backoff_path(spark):
    from mismo_spark.textqa.lm import bigram_lm, bigram_perplexity
    from mismo_spark.textqa.lm import unigram_lm

    train = spark.createDataFrame(
        [(0, "a b a b c")], "doc_id long, text string"
    )
    b_lm, u_lm = bigram_lm(train), unigram_lm(train)
    # 'a b' is a seen bigram; 'b q' backs off to an UNSEEN unigram
    score = spark.createDataFrame(
        [(9, "a b q")], "doc_id long, text string"
    )
    row = bigram_perplexity(score, b_lm, u_lm).collect()[0]
    uni, unseen = _py_lm(["a b a b c"])
    exp = -(uni["a"] + math.log(2 / 2) + (math.log(0.4) + unseen)) / 3
    assert row["cross_entropy"] == pytest.approx(exp, rel=1e-9)
    with pytest.raises(ValueError, match="backoff"):
        bigram_perplexity(score, b_lm, u_lm, backoff=0.0)


def test_bigram_gibberish_ranks_worse(spark):
    from mismo_spark.textqa.lm import bigram_perplexity

    docs = [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    docs.append((100, "dog the over fox quick jumps brown lazy the"))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r["perplexity"] for r in bigram_perplexity(df).collect()}
    # scrambled word order: same unigram profile, much worse bigram fit
    assert rows[100] > rows[0] * 2
