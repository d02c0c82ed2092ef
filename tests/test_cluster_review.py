"""Cluster QA: cohesion stats and the missed-merge review queue."""

import pytest

from mismo_spark.cluster.review import cluster_cohesion, missed_merges


def _assign(spark):
    # component 1: {1,2,3} (chain), component 10: {10,11}, singleton 20
    return spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10), (11, 10), (20, 20)],
        "record_id long, component long",
    )


def _scored(spark):
    return spark.createDataFrame(
        [
            (1, 2, 500.0),    # strong intra (comp 1)
            (2, 3, 0.5),      # weak bridge  (comp 1)
            (10, 11, 80.0),   # intra comp 10
            (3, 10, 900.0),   # HIGH but crosses components
            (1, 20, 2.0),     # low cross: not a missed merge
        ],
        "record_id_l long, record_id_r long, odds double",
    )


def test_cohesion_stats(spark):
    rows = {
        r["component"]: r
        for r in cluster_cohesion(
            _assign(spark), _scored(spark), weak_odds=1.0
        ).collect()
    }
    assert set(rows) == {1, 10}  # singletons excluded
    c1 = rows[1]
    assert c1["n_records"] == 3 and c1["n_links"] == 2
    assert c1["n_weak_links"] == 1
    assert c1["min_odds"] == 0.5
    assert c1["avg_odds"] == pytest.approx(250.25)
    assert c1["density"] == pytest.approx(2 / 3)
    c10 = rows[10]
    assert c10["n_links"] == 1 and c10["density"] == pytest.approx(1.0)
    assert c10["n_weak_links"] == 0


def test_component_without_links_has_zero_stats(spark):
    assign = _assign(spark)
    import pyspark.sql.functions as F

    none = _scored(spark).where(F.lit(False))
    rows = {r["component"]: r for r in cluster_cohesion(assign, none).collect()}
    assert rows[1]["n_links"] == 0 and rows[1]["min_odds"] is None
    assert rows[1]["density"] == 0.0


def test_missed_merges_queue(spark):
    rows = missed_merges(
        _assign(spark), _scored(spark), min_odds=100.0
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["record_id_l"], r["record_id_r"]) == (3, 10)
    assert r["component_l"] == 1 and r["component_r"] == 10
    assert r["odds"] == 900.0
