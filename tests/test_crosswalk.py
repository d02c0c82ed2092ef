"""Cluster crosswalk + event classification between assignment runs."""

from mismo_spark.cluster.crosswalk import cluster_crosswalk, cluster_events


def _assign(spark, rows):
    return spark.createDataFrame(rows, "record_id long, component long")


def test_crosswalk_counts(spark):
    old = _assign(spark, [(1, 1), (2, 1), (3, 3), (4, 3), (9, 9)])
    new = _assign(spark, [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)])
    xw = {
        (r["old_component"], r["new_component"]): r["n_records"]
        for r in cluster_crosswalk(old, new).collect()
    }
    assert xw == {
        (1, 1): 2,      # cluster 1 arrived whole
        (3, 1): 1,      # record 3 split off old cluster 3 into new 1
        (3, 4): 1,      # record 4 became its own cluster
        (9, None): 1,   # record 9 deleted
        (None, 5): 1,   # record 5 is fresh
    }


def test_events_matrix(spark):
    # old: {1,2}=c1  {3,4}=c3  {9}=c9 (deleted)  {6,7}=c6 (stable)
    old = _assign(
        spark, [(1, 1), (2, 1), (3, 3), (4, 3), (9, 9), (6, 6), (7, 6)]
    )
    # new: c1 absorbs record 3 (merge+split source), record 4 alone
    # (split), 5 fresh singleton (new), {6,7} unchanged (stable),
    # {10,11} fresh pair joins nothing (new)
    new = _assign(
        spark,
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5), (6, 6), (7, 6), (10, 10), (11, 10)],
    )
    ev = {r["new_component"]: r for r in cluster_events(old, new).collect()}
    assert ev[1]["event"] == "merge+split"  # c1 + part of c3
    assert ev[1]["n_old_components"] == 2 and ev[1]["is_split"]
    assert ev[4]["event"] == "split" and ev[4]["n_records"] == 1
    assert ev[5]["event"] == "new" and ev[5]["n_new_records"] == 1
    assert ev[6]["event"] == "stable" and not ev[6]["is_merge"]
    assert ev[10]["event"] == "new" and ev[10]["n_records"] == 2


def test_grew_and_deletion_split(spark):
    # {1,2}=c1 gains fresh record 3 -> grew
    old = _assign(spark, [(1, 1), (2, 1), (5, 5), (6, 5)])
    # c5 loses record 6 to deletion -> survivor {5} is a split piece
    new = _assign(spark, [(1, 1), (2, 1), (3, 1), (5, 5)])
    ev = {r["new_component"]: r for r in cluster_events(old, new).collect()}
    assert ev[1]["event"] == "grew"
    assert ev[1]["n_new_records"] == 1 and not ev[1]["is_merge"]
    assert ev[5]["event"] == "split"  # deletion counts as a split
