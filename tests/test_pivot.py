"""pivot_clustering (KwikCluster, id-order pivots) vs the sequential
reference: scan ids ascending, each unremoved id becomes a pivot and
takes every unremoved positive neighbour with it."""

from __future__ import annotations

import random

from mismo_spark.cluster.pivot import pivot_clustering

EDGE_SCHEMA = "record_id_l long, record_id_r long, sim double"
REC_SCHEMA = "record_id long"


def kwik_py(ids, edges, threshold):
    nbr = {i: set() for i in ids}
    for l, r, s in edges:
        if s >= threshold and l != r:
            nbr[l].add(r)
            nbr[r].add(l)
    remaining = set(ids)
    out = {}
    for p in sorted(ids):
        if p not in remaining:
            continue
        out[p] = p
        remaining.discard(p)
        for y in sorted(nbr[p]):
            if y in remaining:
                out[y] = p
                remaining.discard(y)
    return sorted(out.items())


def run(spark, ids, edges, threshold, **kw):
    e = spark.createDataFrame(edges, EDGE_SCHEMA)
    r = spark.createDataFrame([(i,) for i in ids], REC_SCHEMA)
    got = pivot_clustering(e, r, sim_col="sim", threshold=threshold, **kw)
    return sorted((x.record_id, x.cluster) for x in got.collect())


def test_chain_is_not_welded(spark):
    # path 1-2-3-4-5: CC gives one component; KwikCluster cuts it
    ids = [1, 2, 3, 4, 5]
    edges = [(1, 2, 0.9), (2, 3, 0.9), (3, 4, 0.9), (4, 5, 0.9)]
    got = run(spark, ids, edges, threshold=0.8)
    assert got == kwik_py(ids, edges, 0.8)
    assert got == [(1, 1), (2, 1), (3, 3), (4, 3), (5, 5)]


def test_each_record_exactly_once_and_diameter_two(spark):
    rng = random.Random(5)
    ids = list(range(40))
    edges = [
        (a, b, round(rng.random(), 3))
        for a in ids
        for b in ids
        if a < b and rng.random() < 0.15
    ]
    got = run(spark, ids, edges, threshold=0.5)
    assert got == kwik_py(ids, edges, 0.5)
    assert [x for x, _ in got] == sorted(ids)  # exactly one row per record
    # every member is directly linked to its pivot
    pos = {(min(l, r), max(l, r)) for l, r, s in edges if s >= 0.5}
    for rec, piv in got:
        if rec != piv:
            assert (min(rec, piv), max(rec, piv)) in pos


def test_isolated_records_are_singletons(spark):
    ids = [1, 2, 3]
    got = run(spark, ids, [], threshold=0.5)
    assert got == [(1, 1), (2, 2), (3, 3)]


def test_checkpoint_dir_resume_identical(spark, tmp_path):
    ids = [1, 2, 3, 4, 5, 6]
    edges = [(1, 2, 0.9), (2, 3, 0.9), (4, 5, 0.9), (5, 6, 0.9), (1, 6, 0.9)]
    a = run(spark, ids, edges, threshold=0.8)
    b = run(spark, ids, edges, threshold=0.8, checkpoint_dir=str(tmp_path / "p"))
    assert a == b == kwik_py(ids, edges, 0.8)


def test_no_cached_relations_leak(spark):
    """pivot_clustering persists its sim edges across the MIS rounds
    and the membership join; the DataFrame cache must be RELEASED on
    exit (SQL CacheManager check — localCheckpoint RDDs linger until
    GC by design and are excluded)."""
    from mismo_spark.cluster.pivot import pivot_clustering

    spark.catalog.clearCache()
    e = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.7), (4, 5, 0.8)],
        "record_id_l long, record_id_r long, sim double",
    )
    r = spark.createDataFrame([(i,) for i in range(1, 6)], "record_id long")
    pivot_clustering(e, r, sim_col="sim", threshold=0.6).collect()
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
