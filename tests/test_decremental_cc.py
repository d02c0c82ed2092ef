"""Cluster maintenance under deletions: maintain == from-scratch,
splits included, untouched components pass through verbatim."""

from pyspark.sql import functions as F

from mismo_spark.cluster.cc import connected_components
from mismo_spark.cluster.decremental import (
    decremental_components,
    maintain_components,
)


def _links(spark, pairs):
    return spark.createDataFrame(
        pairs, "record_id_l long, record_id_r long"
    )


def _assign(df):
    return {r["record_id"]: r["component"] for r in df.collect()}


def test_deletion_splits_component(spark):
    # chain 1-2-3-4 plus separate pair 10-11; cut 2-3 -> {1,2} {3,4}
    links = _links(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    records = spark.range(0, 12).withColumnRenamed("id", "record_id")
    before = connected_components(links, records)
    removed = _links(spark, [(2, 3)])
    got = decremental_components(before, links, removed)
    want = connected_components(
        links.exceptAll(removed), records
    )
    assert _assign(got) == _assign(want)
    a = _assign(got)
    assert a[1] == a[2] and a[3] == a[4] and a[1] != a[3]


def test_deletion_in_cycle_does_not_split(spark):
    links = _links(spark, [(1, 2), (2, 3), (3, 1)])
    before = connected_components(links)
    got = decremental_components(before, links, _links(spark, [(2, 3)]))
    a = _assign(got)
    assert a == {1: 1, 2: 1, 3: 1}


def test_removed_orientation_free_and_absent_ignored(spark):
    links = _links(spark, [(1, 2), (2, 3)])
    before = connected_components(links)
    # (3, 2) matches stored (2, 3); (7, 8) isn't in links at all
    got = decremental_components(before, links, _links(spark, [(3, 2), (7, 8)]))
    a = _assign(got)
    assert a[1] == a[2] == 1 and a[3] == 3


def test_mixed_add_remove_batch(spark):
    # remove the 2-3 bridge, add 4-10: {1,2} {3,4,10,11}
    links = _links(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    before = connected_components(links)
    got = maintain_components(
        before,
        links,
        added=_links(spark, [(4, 10)]),
        removed=_links(spark, [(2, 3)]),
    )
    want = connected_components(
        links.exceptAll(_links(spark, [(2, 3)])).unionByName(
            _links(spark, [(4, 10)])
        )
    )
    assert _assign(got) == _assign(want)
    a = _assign(got)
    assert a[3] == a[10] == a[11] == 3 and a[1] == a[2] == 1


def test_untouched_components_pass_through(spark):
    links = _links(spark, [(1, 2), (5, 6), (8, 9)])
    before = connected_components(links)
    got = maintain_components(
        before, links, removed=_links(spark, [(1, 2)])
    )
    a = _assign(got)
    assert a == {1: 1, 2: 2, 5: 5, 6: 5, 8: 8, 9: 8}


def test_new_records_become_singletons(spark):
    links = _links(spark, [(1, 2)])
    before = connected_components(links)
    new = spark.createDataFrame([(42,)], "record_id long")
    got = maintain_components(before, links, new_records=new)
    a = _assign(got)
    assert a == {1: 1, 2: 1, 42: 42}


def test_noop_batch_returns_assignments(spark):
    links = _links(spark, [(1, 2)])
    before = connected_components(links)
    got = maintain_components(before, links)
    assert _assign(got) == _assign(before)


def test_random_graph_maintain_equals_recompute(spark):
    # deterministic pseudo-random graph; remove every 3rd edge, add a
    # batch of fresh edges; invariant: maintain == full recompute
    edges = [
        (i % 37, (i * i + 5) % 37) for i in range(80) if i % 37 != (i * i + 5) % 37
    ]
    links = _links(spark, edges).where(F.col("record_id_l") != F.col("record_id_r"))
    records = spark.range(0, 40).withColumnRenamed("id", "record_id")
    before = connected_components(links, records)
    removed = _links(spark, edges[::3])
    added_edges = [(38, 1), (39, 38), (11, 29)]
    added = _links(spark, added_edges)
    got = maintain_components(before, links, added=added, removed=removed)
    # from-scratch graph: orientation-free removal done in Python
    rm_keys = {tuple(sorted(e)) for e in edges[::3]}
    remaining = [
        e
        for e in edges
        if e[0] != e[1] and tuple(sorted(e)) not in rm_keys
    ] + added_edges
    want = connected_components(_links(spark, remaining), records)
    assert _assign(got) == _assign(want)
