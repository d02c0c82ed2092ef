"""BM25 retrieval, meta-blocking, and unlinkables analysis."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _bm25_py(corpus: dict[int, list[str]], query: list[str], k1=1.2, b=0.75):
    """Reference BM25 (Lucene idf form) computed in pure Python."""
    n = len(corpus)
    avgdl = sum(len(t) for t in corpus.values()) / n
    out = {}
    for doc, toks in corpus.items():
        s = 0.0
        for q in set(query):
            tf = toks.count(q)
            if tf == 0:
                continue
            df = sum(1 for t in corpus.values() if q in t)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(toks) / avgdl))
        if s > 0:
            out[doc] = s
    return out


def test_bm25_matches_reference_impl(spark):
    from mismo_spark.sets.bm25 import bm25_scores, bm25_topk

    corpus = {
        1: ["hash", "join", "join", "scan"],
        2: ["scan", "filter", "scan"],
        3: ["join", "vector"],
        4: ["sort", "sort", "sort", "sort", "sort", "sort"],
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in corpus.items()], "record_id long, toks array<string>"
    )
    queries = spark.createDataFrame(
        [("q1", ["join", "scan"])], "query_id string, terms array<string>"
    )
    got = {
        r["record_id"]: r["score"]
        for r in bm25_scores(docs, "toks", queries).collect()
    }
    want = _bm25_py(corpus, ["join", "scan"])
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, (d, got[d], want[d])

    top = bm25_topk(docs, "toks", queries, k=2).orderBy("rank").collect()
    ranked = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:2]
    assert [(r["record_id"], r["rank"]) for r in top] == [
        (ranked[0][0], 1),
        (ranked[1][0], 2),
    ]


def test_meta_blocking_weights_and_pruning(spark):
    from mismo_spark.linker.meta import (
        block_collection,
        candidate_graph,
        meta_block,
        prune_cnp,
        prune_wep,
    )

    # records: a,b share 2 schemes; a,c share 1; d isolated by purging
    df = spark.createDataFrame(
        [
            (1, "x", "p"),
            (2, "x", "p"),
            (3, "x", "q"),
            (4, None, "r"),
        ],
        "record_id long, k1 string, k2 string",
    )
    blocks = block_collection(df, ["k1", "k2"])
    # record 4 contributes only the k2 block (k1 null filtered)
    assert blocks.filter(F.col("record_id") == 4).count() == 1

    g = candidate_graph(df, ["k1", "k2"]).collect()
    got = {(r["record_id_l"], r["record_id_r"]): r for r in g}
    assert got[(1, 2)]["cbs"] == 2
    assert abs(got[(1, 2)]["js"] - 1.0) < 1e-12  # 2/(2+2-2)
    assert got[(1, 3)]["cbs"] == 1
    assert abs(got[(1, 3)]["js"] - 1 / 3) < 1e-12
    assert (4, 4) not in got and all(4 not in p for p in got)

    # WEP: mean js = (1 + 1/3 + 1/3)/3 ≈ 0.5556 → only (1,2) survives
    wep = prune_wep(candidate_graph(df, ["k1", "k2"])).collect()
    assert {(r["record_id_l"], r["record_id_r"]) for r in wep} == {(1, 2)}

    # CNP k=1: (1,2) is top-1 of 1 and of 2; (1,3) is top-1 of 3 → kept
    cnp = prune_cnp(candidate_graph(df, ["k1", "k2"]), k=1).collect()
    assert {(r["record_id_l"], r["record_id_r"]) for r in cnp} == {(1, 2), (1, 3)}

    # block purging: cap of 2 kills the size-3 k1=x block
    purged = candidate_graph(df, ["k1", "k2"], max_block_size=2).collect()
    got2 = {(r["record_id_l"], r["record_id_r"]): r["cbs"] for r in purged}
    assert got2 == {(1, 2): 1}  # only the k2=p block survives

    assert meta_block(df, ["k1", "k2"], scheme="none").count() == 3


def test_unlinkables(spark):
    from mismo_spark.fs.unlinkables import best_scores, unlinkables

    records = spark.createDataFrame([(i,) for i in range(1, 6)], "record_id long")
    links = spark.createDataFrame(
        [
            (1, 2, 9.0),
            (1, 3, 4.0),
            (2, 3, 4.0),
        ],
        "record_id_l long, record_id_r long, odds double",
    )
    best = {r["record_id"]: r["best"] for r in best_scores(records, links).collect()}
    assert best == {1: 9.0, 2: 9.0, 3: 4.0, 4: None, 5: None}

    out = unlinkables(records, links).collect()
    # ordered: NULL (2 records), 4.0 (1), 9.0 (2)
    assert [r["best"] for r in out] == [None, 4.0, 9.0]
    assert [r["n_records"] for r in out] == [2, 1, 2]
    assert [r["cum_records"] for r in out] == [2, 3, 5]
    assert abs(out[1]["cum_prop"] - 0.6) < 1e-12
    assert abs(out[2]["cum_prop"] - 1.0) < 1e-12
