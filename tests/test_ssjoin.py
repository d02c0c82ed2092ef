"""Prefix-filter set-similarity join + sparse TF-IDF cosine pairs."""

from __future__ import annotations

import itertools
import math

import pytest
from pyspark.sql import functions as F

from mismo_spark.sets.ssjoin import prefix_filter_pairs, tfidf_cosine_pairs


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, toks) for i, toks in enumerate(rows)],
        "record_id bigint, toks array<string>",
    )


ROWS = [
    ["apple", "banana", "cherry", "date"],
    ["apple", "banana", "cherry", "fig"],          # J=3/5 with row 0
    ["apple", "banana"],                            # small set
    ["grape", "kiwi", "lemon"],
    ["grape", "kiwi", "lemon", "mango"],            # J=3/4 with row 3
    ["apple", "banana", "cherry", "date"],          # exact dup of row 0
    ["zeta"],
    [],
]


def _brute_jaccard(a, b):
    sa, sb = set(a), set(b)
    if not sa | sb:
        return 0.0
    inter = len(sa & sb)
    return 0.0 if inter == 0 else inter / len(sa | sb)


@pytest.mark.parametrize("t", [0.5, 0.7, 0.99, 1.0])
def test_prefix_filter_matches_brute_force(spark, t):
    df = _corpus(spark, ROWS)
    got = {
        (r["record_id_l"], r["record_id_r"]): r["jaccard"]
        for r in prefix_filter_pairs(df, "toks", threshold=t).collect()
    }
    want = {
        (i, j): _brute_jaccard(a, b)
        for (i, a), (j, b) in itertools.combinations(enumerate(ROWS), 2)
        if _brute_jaccard(a, b) >= t
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v)


def test_prefix_filter_validates_threshold(spark):
    df = _corpus(spark, ROWS[:2])
    with pytest.raises(ValueError):
        prefix_filter_pairs(df, "toks", threshold=0.0)
    with pytest.raises(ValueError):
        prefix_filter_pairs(df, "toks", threshold=1.5)


def test_prefix_filter_never_joins_full_sets(spark):
    """The candidate join must run on prefix tokens only: with t=1.0 the
    prefix is a single (rarest) token per record."""
    df = _corpus(spark, ROWS)
    pairs = prefix_filter_pairs(df, "toks", threshold=1.0).collect()
    assert {(r["record_id_l"], r["record_id_r"]) for r in pairs} == {(0, 5)}
    assert pairs[0]["jaccard"] == 1.0


def _brute_tfidf_cosine(rows, df_cap=None):
    n = len(rows)
    docfreq: dict[str, int] = {}
    for toks in rows:
        for tok in set(toks):
            docfreq[tok] = docfreq.get(tok, 0) + 1
    vecs = []
    for toks in rows:
        tf: dict[str, int] = {}
        for tok in toks:
            tf[tok] = tf.get(tok, 0) + 1
        w = {
            tok: c * math.log(n / docfreq[tok])
            for tok, c in tf.items()
            if df_cap is None or docfreq[tok] <= df_cap
        }
        nrm = math.sqrt(sum(x * x for x in w.values()))
        vecs.append({k: v / nrm for k, v in w.items()} if nrm > 0 else {})
    out = {}
    for i, j in itertools.combinations(range(n), 2):
        c = sum(vecs[i][k] * vecs[j][k] for k in vecs[i] if k in vecs[j])
        out[(i, j)] = round(c, 6)
    return out


def test_tfidf_cosine_pairs(spark):
    rows = [r for r in ROWS if r]  # skip the empty doc: it has no tokens
    df = _corpus(spark, rows)
    got = {
        (r["record_id_l"], r["record_id_r"]): r["cosine"]
        for r in tfidf_cosine_pairs(df, "toks", min_cosine=0.01).collect()
    }
    want = {k: v for k, v in _brute_tfidf_cosine(rows).items() if v >= 0.01}
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=2e-6)


def test_tfidf_cosine_df_cap_drops_stopwords(spark):
    rows = [["the", "apple"], ["the", "banana"], ["the", "cherry"],
            ["apple", "cherry"]]
    df = _corpus(spark, rows)
    # "the" appears in 3 of 4 docs; with df_cap=2 it is dropped, so the
    # first three docs share nothing.
    got = {
        (r["record_id_l"], r["record_id_r"])
        for r in tfidf_cosine_pairs(
            df, "toks", min_cosine=0.01, df_cap=2
        ).collect()
    }
    want = {
        k
        for k, v in _brute_tfidf_cosine(rows, df_cap=2).items()
        if v >= 0.01
    }
    assert got == want


def test_containment_and_overlap(spark):
    from pyspark.sql import functions as F

    from mismo_spark.sets.compare import containment, overlap_coefficient

    df = spark.createDataFrame(
        [
            (["a", "b"], ["a", "b", "c", "d"]),   # a fully inside b
            (["a", "b", "c", "d"], ["a", "b"]),   # reverse: half inside
            (["x"], ["y"]),                        # disjoint
            ([], ["y"]),                           # empty probe
            (None, ["y"]),                         # null
        ],
        "a array<string>, b array<string>",
    )
    rows = df.select(
        containment(F.col("a"), F.col("b")).alias("c"),
        overlap_coefficient(F.col("a"), F.col("b")).alias("o"),
    ).collect()
    assert [r["c"] for r in rows] == [1.0, 0.5, 0.0, 0.0, None]
    assert [r["o"] for r in rows] == [1.0, 1.0, 0.0, 0.0, None]
