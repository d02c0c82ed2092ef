"""Linkage / LinkedTable semantics — FIXTURES.md F7
(mismo/types/_linked_table.py:80-137,210-233)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mismo_spark import Linkage
from mismo_spark.types.linked_table import link_counts, with_linked_values, with_n_links
from tests.conftest import assert_df_equal


@pytest.fixture
def f7(spark):
    left = spark.createDataFrame(
        [(40, "a"), (50, "b"), (60, "c")], "record_id long, x string"
    )
    right = spark.createDataFrame(
        [(41, 4.1), (42, 4.2), (51, 9.0)], "record_id long, y double"
    )
    links = spark.createDataFrame(
        [(40, 41), (40, 42), (50, 51)], "record_id_l long, record_id_r long"
    )
    return left, right, links


def test_with_linked_values(f7):
    left, right, links = f7
    out = with_linked_values(left, right, links, side="l", ys="y")
    got = {r["record_id"]: sorted(r["ys"]) if r["ys"] else r["ys"] for r in out.collect()}
    assert got == {40: [4.1, 4.2], 50: [9.0], 60: None}


def test_with_linked_values_agg(f7):
    left, right, links = f7
    out = with_linked_values(
        left, right, links, side="l", y_max=lambda df: F.max("y")
    )
    got = {r["record_id"]: r["y_max"] for r in out.collect()}
    assert got == {40: 4.2, 50: 9.0, 60: None}


def test_with_n_links(f7):
    left, right, links = f7
    out = with_n_links(left, links, side="l")
    got = {r["record_id"]: r["n_links"] for r in out.collect()}
    assert got == {40: 2, 50: 1, 60: 0}


def test_link_counts(f7):
    left, right, links = f7
    assert_df_equal(link_counts(left, links, side="l"), [(0, 1), (1, 1), (2, 1)])


def test_links_with_both(f7):
    left, right, links = f7
    lk = Linkage(left, right, links)
    out = lk.links_with_both()
    rows = {(r["record_id_l"], r["record_id_r"], r["x_l"], r["y_r"]) for r in out.collect()}
    assert rows == {(40, 41, "a", 4.1), (40, 42, "a", 4.2), (50, 51, "b", 9.0)}


def test_parquet_round_trip(f7, spark, tmp_path):
    left, right, links = f7
    lk = Linkage(left, right, links)
    lk.to_parquets(str(tmp_path / "ckpt"))
    lk2 = Linkage.from_parquets(spark, str(tmp_path / "ckpt"))
    assert lk2.links.count() == 3
    assert set(lk2.left.columns) == {"record_id", "x"}


def test_best_match_per_right(spark):
    left = spark.createDataFrame([(1,), (2,)], "record_id long")
    right = spark.createDataFrame([(10,)], "record_id long")
    links = spark.createDataFrame(
        [(1, 10, 0.9), (2, 10, 0.5)], "record_id_l long, record_id_r long, score double"
    )
    lk = Linkage(left, right, links).best_match_per_right("score")
    assert [(r["record_id_l"], r["record_id_r"]) for r in lk.links.collect()] == [(1, 10)]


def test_swap_perspective(f7):
    left, right, links = f7
    sw = Linkage(left, right, links).swap_perspective()
    got = {(r["record_id_l"], r["record_id_r"]) for r in sw.links.collect()}
    assert got == {(41, 40), (42, 40), (51, 50)}
