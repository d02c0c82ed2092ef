"""canopy_centers / canopy_assign vs a sequential Python reference.

Centers must equal the id-order greedy pass (pick smallest remaining
id, drop its tight-neighbours, repeat) on every graph; membership is
the order-free loose join documented in the module."""

from __future__ import annotations

import random

import pytest

from mismo_spark.linker.canopy import canopy_assign, canopy_centers

EDGE_SCHEMA = "record_id_l long, record_id_r long, sim double"
REC_SCHEMA = "record_id long"


def centers_py(ids, edges, tight):
    nbr = {i: set() for i in ids}
    for l, r, s in edges:
        if s >= tight and l != r:
            nbr[l].add(r)
            nbr[r].add(l)
    pool, centers = set(ids), []
    for c in sorted(ids):
        if c not in pool:
            continue
        centers.append(c)
        pool.discard(c)
        pool -= nbr[c]
    return sorted(centers)


def assign_py(ids, edges, tight, loose):
    cs = set(centers_py(ids, edges, tight))
    out = {(c, c) for c in cs}
    for l, r, s in edges:
        if s >= loose and l != r:
            if r in cs:
                out.add((l, r))
            if l in cs:
                out.add((r, l))
    return sorted(out)


def run(spark, ids, edges, tight, loose=None, **kw):
    e = spark.createDataFrame(edges, EDGE_SCHEMA)
    r = spark.createDataFrame([(i,) for i in ids], REC_SCHEMA)
    if loose is None:
        got = canopy_centers(e, r, sim_col="sim", tight=tight, **kw)
        return sorted(x.record_id for x in got.collect())
    got = canopy_assign(e, r, sim_col="sim", tight=tight, loose=loose, **kw)
    return sorted((x.record_id, x.canopy) for x in got.collect())


def test_chain_centers(spark):
    # path 1-2-3-4 at tight sim: LFMIS = {1, 3}
    ids = [1, 2, 3, 4]
    edges = [(1, 2, 0.9), (2, 3, 0.9), (3, 4, 0.9)]
    assert run(spark, ids, edges, tight=0.8) == [1, 3]
    assert run(spark, ids, edges, tight=0.8) == centers_py(ids, edges, 0.8)


def test_isolated_records_are_own_centers(spark):
    ids = [1, 2, 3]
    assert run(spark, ids, [], tight=0.8) == [1, 2, 3]


def test_membership_overlap_and_coverage(spark):
    # 2 is loose-similar to both centers 1 and 3 -> two canopies
    ids = [1, 2, 3, 4]
    edges = [(1, 2, 0.85), (2, 3, 0.85), (3, 4, 0.95), (1, 4, 0.5)]
    got = run(spark, ids, edges, tight=0.8, loose=0.4)
    assert got == assign_py(ids, edges, 0.8, 0.4)
    by_rec = {}
    for rec, can in got:
        by_rec.setdefault(rec, []).append(can)
    assert sorted(by_rec[2]) == [1, 3]
    assert set(by_rec) == set(ids)  # every record in >= 1 canopy


def test_randomized_equivalence(spark):
    rng = random.Random(13)
    ids = list(range(30))
    seen = set()
    edges = []
    for _ in range(120):
        a, b = rng.randrange(30), rng.randrange(30)
        if a == b or (min(a, b), max(a, b)) in seen:
            continue
        seen.add((min(a, b), max(a, b)))
        edges.append((min(a, b), max(a, b), round(rng.random(), 3)))
    assert run(spark, ids, edges, tight=0.6) == centers_py(ids, edges, 0.6)
    assert run(spark, ids, edges, tight=0.6, loose=0.3) == assign_py(
        ids, edges, 0.6, 0.3
    )


def test_centers_form_tight_independent_set(spark):
    rng = random.Random(29)
    ids = list(range(25))
    edges = [
        (a, b, round(rng.random(), 3))
        for a in ids
        for b in ids
        if a < b and rng.random() < 0.2
    ]
    cs = set(run(spark, ids, edges, tight=0.5))
    for l, r, s in edges:
        if s >= 0.5:
            assert not (l in cs and r in cs)  # independence
    # maximality: every non-center has a tight edge to a center
    for i in set(ids) - cs:
        assert any(
            s >= 0.5 and ((l == i and r in cs) or (r == i and l in cs))
            for l, r, s in edges
        )


def test_checkpoint_dir_resume_identical(spark, tmp_path):
    ids = [1, 2, 3, 4, 5]
    edges = [(1, 2, 0.9), (2, 3, 0.9), (3, 4, 0.9), (4, 5, 0.9)]
    a = run(spark, ids, edges, tight=0.8, loose=0.8)
    b = run(spark, ids, edges, tight=0.8, loose=0.8, checkpoint_dir=str(tmp_path / "c"))
    assert a == b


def test_canopy_pairs_shared_membership(spark):
    from mismo_spark.linker.canopy import canopy_pairs

    ids = [1, 2, 3, 4]
    edges = [(1, 2, 0.85), (2, 3, 0.85), (3, 4, 0.95), (1, 4, 0.5)]
    e = spark.createDataFrame(edges, EDGE_SCHEMA)
    r = spark.createDataFrame([(i,) for i in ids], REC_SCHEMA)
    assign = canopy_assign(e, r, sim_col="sim", tight=0.8, loose=0.4)
    got = sorted(tuple(x) for x in canopy_pairs(assign).collect())
    # expected: all pairs co-resident in some canopy of assign_py
    a = assign_py(ids, edges, 0.8, 0.4)
    cans = {}
    for rec, can in a:
        cans.setdefault(can, set()).add(rec)
    want = sorted(
        {
            (min(x, y), max(x, y))
            for members in cans.values()
            for x in members
            for y in members
            if x != y
        }
    )
    assert got == want


def test_bad_thresholds_raise(spark):
    e = spark.createDataFrame([(1, 2, 0.9)], EDGE_SCHEMA)
    r = spark.createDataFrame([(1,), (2,)], REC_SCHEMA)
    with pytest.raises(ValueError, match="loose"):
        canopy_assign(e, r, sim_col="sim", tight=0.5, loose=0.9)


def test_no_cached_relations_leak(spark):
    """canopy_assign persists its sim edges across the center rounds
    and the membership join; the DataFrame cache must be RELEASED on
    exit (checked via the SQL CacheManager, which tracks df.persist()
    but not the per-round localCheckpoint RDDs that linger until GC)
    so long-lived sessions (oracle harness, notebooks) stay flat."""
    spark.catalog.clearCache()
    edges = [(1, 2, 0.9), (2, 3, 0.7), (4, 5, 0.8)]
    run(spark, [1, 2, 3, 4, 5], edges, tight=0.8, loose=0.5)
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty()
