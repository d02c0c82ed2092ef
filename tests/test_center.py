"""center_clustering vs the sequential CENTER scan (score DESC, then
(min_id, max_id); smaller id of a fresh pair becomes the center)."""

from __future__ import annotations

import random

import pytest

from mismo_spark.cluster.center import center_clustering

SCHEMA = "record_id_l long, record_id_r long, score double"
REC_SCHEMA = "record_id long"

U, C, M = 0, 1, 2


def center_py(ids, edges, threshold=None):
    es = {}
    for l, r, s in edges:
        if l == r or s is None:
            continue
        if threshold is not None and s < threshold:
            continue
        k = (min(l, r), max(l, r))
        es.setdefault(k, s)
    order = sorted(es.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
    state = {i: U for i in ids}
    ctr = {}
    for (a, b), _ in order:
        sa, sb = state[a], state[b]
        if sa == U and sb == U:
            c, m = (a, b) if a < b else (b, a)
            state[c], state[m] = C, M
            ctr[c], ctr[m] = c, c
        elif sa == C and sb == U:
            state[b], ctr[b] = M, a
        elif sb == C and sa == U:
            state[a], ctr[a] = M, b
        # member + U, or both settled: skip
    return sorted((i, ctr.get(i, i)) for i in ids)


def run(spark, ids, edges, **kw):
    e = spark.createDataFrame(edges, SCHEMA)
    r = spark.createDataFrame([(i,) for i in ids], REC_SCHEMA)
    got = center_clustering(e, r, score_col="score", **kw)
    return sorted((x.record_id, x.cluster) for x in got.collect())


def test_strongest_pair_seeds_the_cluster(spark):
    # edge (2,3) is strongest: 2 becomes center; 1 then joins 2 via the
    # weaker edge; 4's only edge arrives member-to-member -> singleton
    ids = [1, 2, 3, 4]
    edges = [(2, 3, 0.9), (1, 2, 0.8), (3, 4, 0.7)]
    got = run(spark, ids, edges)
    assert got == center_py(ids, edges)
    assert got == [(1, 2), (2, 2), (3, 2), (4, 4)]


def test_score_order_beats_id_order(spark):
    # id-order pivots would pick 1 first; CENTER picks the (3,4) pair
    ids = [1, 2, 3, 4]
    edges = [(1, 2, 0.5), (3, 4, 0.9), (2, 3, 0.7)]
    got = run(spark, ids, edges)
    assert got == center_py(ids, edges)
    assert got == [(1, 1), (2, 3), (3, 3), (4, 3)]


def test_hot_center_collapses_fast(spark):
    # star: center 1 with 30 spokes in descending score — one round
    # freezes 1, the rest join in bulk
    ids = list(range(1, 32))
    edges = [(1, k, 1.0 - k * 0.01) for k in range(2, 32)]
    got = run(spark, ids, edges, max_rounds=6)
    assert got == center_py(ids, edges)
    assert all(c == 1 for _, c in got)


def test_randomized_equivalence(spark):
    rng = random.Random(23)
    ids = list(range(30))
    seen = set()
    edges = []
    for _ in range(150):
        a, b = rng.randrange(30), rng.randrange(30)
        k = (min(a, b), max(a, b))
        if a == b or k in seen:
            continue
        seen.add(k)
        edges.append((a, b, round(rng.random(), 3)))
    assert run(spark, ids, edges) == center_py(ids, edges)


def test_threshold_and_duplicates_and_nulls(spark):
    ids = [1, 2, 3]
    edges = [(1, 2, 0.9), (2, 1, 0.9), (2, 3, 0.2), (1, 3, None)]
    got = run(spark, ids, edges, threshold=0.5)
    assert got == center_py(ids, edges, threshold=0.5)
    assert got == [(1, 1), (2, 1), (3, 3)]


def test_every_record_exactly_once_star_shape(spark):
    rng = random.Random(31)
    ids = list(range(25))
    edges = [
        (a, b, round(rng.random(), 3))
        for a in ids
        for b in ids
        if a < b and rng.random() < 0.2
    ]
    got = run(spark, ids, edges)
    assert [x for x, _ in got] == sorted(ids)
    # star shape: every member directly linked to its center
    pos = {(min(l, r), max(l, r)) for l, r, _ in edges}
    for rec, c in got:
        if rec != c:
            assert (min(rec, c), max(rec, c)) in pos


def test_checkpoint_dir_resume_identical(spark, tmp_path):
    ids = [1, 2, 3, 4, 5]
    edges = [(2, 3, 0.9), (1, 2, 0.8), (3, 4, 0.7), (4, 5, 0.6)]
    a = run(spark, ids, edges)
    b = run(spark, ids, edges, checkpoint_dir=str(tmp_path / "ctr"))
    assert a == b == center_py(ids, edges)


def test_max_rounds_raises(spark):
    # long dependency chain of strictly descending scores
    ids = list(range(12))
    edges = [(k, k + 1, 1.0 - 0.05 * k) for k in range(11)]
    with pytest.raises(RuntimeError, match="converge"):
        run(spark, ids, edges, max_rounds=1)
    assert run(spark, ids, edges) == center_py(ids, edges)
