"""Blocking-quality metrics (reduction ratio / completeness / quality)."""

from __future__ import annotations

import pytest

from mismo_spark.linker.eval import blocking_metrics


def _pairs(spark, rows):
    return spark.createDataFrame(
        rows, "record_id_l long, record_id_r long"
    )


def test_blocking_metrics_dedupe(spark):
    # 6 records -> n_naive = 15
    cand = _pairs(spark, [(1, 2), (3, 4), (5, 6), (1, 3)])
    true = _pairs(spark, [(1, 2), (3, 4), (2, 5)])
    r = blocking_metrics(cand, true, n_left=6).first()
    assert r["n_naive"] == 15
    assert r["n_candidates"] == 4
    assert r["n_true"] == 3
    assert r["n_found"] == 2
    assert r["reduction_ratio"] == pytest.approx((15 - 4) / 15, abs=1e-6)
    assert r["pairs_completeness"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["pairs_quality"] == pytest.approx(0.5, abs=1e-6)


def test_blocking_metrics_unordered_and_dup_tolerant(spark):
    # reversed / duplicated pairs canonicalize to the same key
    cand = _pairs(spark, [(2, 1), (1, 2), (4, 3)])
    true = _pairs(spark, [(1, 2)])
    r = blocking_metrics(cand, true, n_left=4).first()
    assert r["n_candidates"] == 2
    assert r["n_found"] == 1
    assert r["pairs_completeness"] == 1.0


def test_blocking_metrics_link_task(spark):
    cand = _pairs(spark, [(1, 10), (2, 20)])
    true = _pairs(spark, [(1, 10), (3, 30)])
    r = blocking_metrics(cand, true, n_left=3, n_right=40, task="link").first()
    assert r["n_naive"] == 120
    assert r["n_found"] == 1
    assert r["pairs_quality"] == 0.5
    with pytest.raises(ValueError):
        blocking_metrics(cand, true, n_left=3, task="link")
    with pytest.raises(ValueError):
        blocking_metrics(cand, true, n_left=3, task="cluster")


def test_blocking_metrics_empty_sets(spark):
    empty = _pairs(spark, [])
    cand = _pairs(spark, [(1, 2)])
    r = blocking_metrics(cand, empty, n_left=3).first()
    assert r["pairs_completeness"] == 0.0 and r["n_true"] == 0
    r2 = blocking_metrics(empty, cand, n_left=3).first()
    assert r2["pairs_quality"] == 0.0 and r2["n_candidates"] == 0


def test_compare_blocking_schemes(spark):
    import pytest
    from pyspark.sql import functions as F

    from mismo_spark.linker.eval import compare_blocking_schemes

    links_a = spark.createDataFrame(
        [(1, 2), (3, 4)], "record_id_l long, record_id_r long"
    )
    links_b = spark.createDataFrame(
        [(1, 2)], "record_id_l long, record_id_r long"
    )
    true = spark.createDataFrame(
        [(1, 2), (5, 6)], "record_id_l long, record_id_r long"
    )
    out = compare_blocking_schemes(
        {"a": links_a, "b": links_b}, true, n_left=10
    )
    rows = {r["scheme"]: r for r in out.collect()}
    assert set(rows) == {"a", "b"}
    assert rows["a"]["n_candidates"] == 2 and rows["a"]["n_found"] == 1
    assert rows["a"]["pairs_completeness"] == 0.5
    assert rows["b"]["n_candidates"] == 1
    assert rows["b"]["pairs_quality"] == 1.0
    assert rows["a"]["n_naive"] == 45
    with pytest.raises(ValueError):
        compare_blocking_schemes({}, true, n_left=10)
