"""TimeWindowLinker: exact-recall temporal blocking via bucket
equi-join (mismo_spark/linker/time.py).  Ground truth is a brute-force
|Δt| ≤ window filter over all pairs."""

from __future__ import annotations

import datetime as dt
import itertools

import pytest
from pyspark.sql import functions as F

from mismo_spark.linker.time import TimeWindowLinker

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _records(spark, offsets_sec, users=None):
    rows = [
        (i, T0 + dt.timedelta(seconds=s), (users[i] if users else 0))
        for i, s in enumerate(offsets_sec)
    ]
    return spark.createDataFrame(
        rows, "record_id long, ts timestamp, user long"
    )


def _brute(offsets_sec, window, users=None):
    out = set()
    for a, b in itertools.combinations(range(len(offsets_sec)), 2):
        if users is not None and users[a] != users[b]:
            continue
        if abs(offsets_sec[a] - offsets_sec[b]) <= window:
            out.add((min(a, b), max(a, b)))
    return out


class TestDedupe:
    # offsets straddle bucket boundaries on purpose: window=10 buckets
    # are [0,10), [10,20)… — the 9.5/10.5 pair crosses a boundary
    OFFSETS = [0.0, 3.0, 9.5, 10.5, 25.0, 31.0, 99.0, 104.9, 105.1]

    def test_matches_brute_force(self, spark):
        df = _records(spark, self.OFFSETS)
        links = TimeWindowLinker("ts", window=10.0)(df).links
        got = {
            (r.record_id_l, r.record_id_r) for r in links.collect()
        }
        assert got == _brute(self.OFFSETS, 10.0)

    def test_no_duplicate_pairs(self, spark):
        df = _records(spark, self.OFFSETS)
        links = TimeWindowLinker("ts", window=10.0)(df).links
        assert links.count() == links.distinct().count()

    def test_keys_partition_the_pairs(self, spark):
        users = [0, 1, 0, 0, 1, 1, 0, 1, 0]
        df = _records(spark, self.OFFSETS, users)
        links = TimeWindowLinker("ts", window=10.0, keys=["user"])(df).links
        got = {(r.record_id_l, r.record_id_r) for r in links.collect()}
        assert got == _brute(self.OFFSETS, 10.0, users)

    def test_null_timestamp_never_matches(self, spark):
        df = _records(spark, [0.0, 1.0]).unionByName(
            spark.createDataFrame(
                [(99, None, 0)], "record_id long, ts timestamp, user long"
            )
        )
        links = TimeWindowLinker("ts", window=10.0)(df).links
        ids = {r.record_id_l for r in links.collect()} | {
            r.record_id_r for r in links.collect()
        }
        assert 99 not in ids

    def test_window_validation(self, spark):
        with pytest.raises(ValueError):
            TimeWindowLinker("ts", window=0)


class TestLink:
    def test_cross_table_matches_brute_force(self, spark):
        l_off = [0.0, 7.0, 50.0, 61.0]
        r_off = [4.0, 12.0, 55.0, 300.0]
        left = _records(spark, l_off)
        right = spark.createDataFrame(
            [
                (100 + i, T0 + dt.timedelta(seconds=s), 0)
                for i, s in enumerate(r_off)
            ],
            "record_id long, ts timestamp, user long",
        )
        links = TimeWindowLinker("ts", window=10.0, task="link")(
            left, right
        ).links
        got = {(r.record_id_l, r.record_id_r) for r in links.collect()}
        want = {
            (i, 100 + j)
            for i, a in enumerate(l_off)
            for j, b in enumerate(r_off)
            if abs(a - b) <= 10.0
        }
        assert got == want

    def test_exact_boundary_inclusive(self, spark):
        left = _records(spark, [0.0])
        right = spark.createDataFrame(
            [(100, T0 + dt.timedelta(seconds=10.0), 0)],
            "record_id long, ts timestamp, user long",
        )
        links = TimeWindowLinker("ts", window=10.0, task="link")(
            left, right
        ).links
        assert links.count() == 1
