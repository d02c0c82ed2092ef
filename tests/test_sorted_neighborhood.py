"""SortedNeighborhoodLinker: window semantics, determinism, scalable
rank construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mismo_spark.linker.sorted_neighborhood import (
    SortedNeighborhoodLinker,
    global_rank,
)


def links_set(lk):
    return {
        (r["record_id_l"], r["record_id_r"])
        for r in lk.links.select("record_id_l", "record_id_r").collect()
    }


def _brute_force_dedupe(rows, w):
    """Reference semantics: sort by (key, id), link each to w-1
    successors."""
    s = sorted((k, i) for i, k in rows if k is not None)
    out = set()
    for a in range(len(s)):
        for b in range(a + 1, min(a + w, len(s))):
            x, y = s[a][1], s[b][1]
            out.add((min(x, y), max(x, y)))
    return out


def test_dedupe_matches_brute_force(spark):
    rows = [
        (1, "alpha"), (2, "beta"), (3, "aalpha"), (4, "gamma"),
        (5, "beta"), (6, None), (7, "delta"), (8, "alpha"),
    ]
    df = spark.createDataFrame(rows, "record_id long, k string")
    for w in (2, 3, 4):
        got = links_set(
            SortedNeighborhoodLinker("k", window=w, task="dedupe")(df)
        )
        assert got == _brute_force_dedupe(rows, w), w


def test_dedupe_catches_typo_neighbours_keylinker_misses(spark):
    """The motivating case: adjacent sort keys that agree on no exact
    key still pair."""
    df = spark.createDataFrame(
        [(1, "smith john"), (2, "smith jon"), (3, "zzz")],
        "record_id long, k string",
    )
    got = links_set(SortedNeighborhoodLinker("k", window=2, task="dedupe")(df))
    assert (1, 2) in got


def test_rank_is_global_and_deterministic(spark):
    df = spark.createDataFrame(
        [(i, f"k{i % 37:02d}") for i in range(500)],
        "record_id long, k string",
    ).repartition(13)
    r1 = global_rank(df, ["k", "record_id"], num_partitions=7)
    ranks = [
        r["__rank"]
        for r in r1.orderBy("k", "record_id").select("__rank").collect()
    ]
    assert ranks == list(range(1, 501))
    r2 = global_rank(df.repartition(3), ["k", "record_id"], num_partitions=4)
    m1 = {r["record_id"]: r["__rank"] for r in r1.collect()}
    m2 = {r["record_id"]: r["__rank"] for r in r2.collect()}
    assert m1 == m2


def test_link_cross_side_only(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "c"), (3, "e")], "record_id long, k string"
    )
    right = spark.createDataFrame(
        [(10, "b"), (11, "d")], "record_id long, k string"
    )
    got = links_set(
        SortedNeighborhoodLinker("k", window=2, task="link")(left, right)
    )
    # merged order: a(L) b(R) c(L) d(R) e(L); adjacent cross pairs only
    assert got == {(1, 10), (2, 10), (2, 11), (3, 11)}


def test_window_validation():
    with pytest.raises(ValueError):
        SortedNeighborhoodLinker("k", window=1)


def test_no_single_task_global_window(spark):
    """The rank plan must not contain a partition-less window (the
    single-task global sort trap)."""
    df = spark.createDataFrame(
        [(i, str(i)) for i in range(100)], "record_id long, k string"
    )
    lk = SortedNeighborhoodLinker("k", window=3, task="dedupe")(df)
    plan = lk.links._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # a global window shows as 'Exchange SinglePartition' feeding Window
    assert "Exchange SinglePartition" not in plan, plan


def test_rank_broadcast_offset_path(spark):
    """>256 range partitions takes the broadcast-join offset path and
    must produce the identical ranking."""
    df = spark.createDataFrame(
        [(i, f"k{i:04d}") for i in range(600)], "record_id long, k string"
    )
    few = global_rank(df, ["k", "record_id"], num_partitions=4)
    many = global_rank(df, ["k", "record_id"], num_partitions=300)
    m1 = {r["record_id"]: r["__rank"] for r in few.collect()}
    m2 = {r["record_id"]: r["__rank"] for r in many.collect()}
    assert m1 == m2
