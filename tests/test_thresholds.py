"""Multi-threshold clustering: fold == from-scratch at every
threshold, monotone coarsening, validation."""

import pytest
from pyspark.sql import functions as F

from mismo_spark.cluster.cc import connected_components
from mismo_spark.cluster.thresholds import components_at_thresholds


def _scored(spark):
    rows = [
        (1, 2, 1000.0),
        (2, 3, 120.0),
        (3, 4, 15.0),
        (5, 6, 500.0),
        (6, 7, 8.0),
        (8, 9, 2.0),
    ]
    return spark.createDataFrame(
        rows, "record_id_l long, record_id_r long, odds double"
    )


def test_fold_equals_from_scratch(spark):
    scored = _scored(spark)
    records = spark.range(1, 11).withColumnRenamed("id", "record_id")
    ts = [1000.0, 100.0, 10.0, 1.0]
    out = components_at_thresholds(scored, ts, records)
    got = {
        (r["threshold"], r["record_id"]): r["component"]
        for r in out.collect()
    }
    for t in ts:
        want = {
            r["record_id"]: r["component"]
            for r in connected_components(
                scored.where(F.col("odds") >= t).select(
                    "record_id_l", "record_id_r"
                ),
                records,
            ).collect()
        }
        for rid, comp in want.items():
            assert got[(t, rid)] == comp, (t, rid)
    # every record present at every threshold
    assert len(got) == len(ts) * 10


def test_monotone_coarsening(spark):
    scored = _scored(spark)
    records = spark.range(1, 11).withColumnRenamed("id", "record_id")
    out = components_at_thresholds(
        scored, [500.0, 50.0, 5.0], records
    ).collect()
    n_comps = {}
    for r in out:
        n_comps.setdefault(r["threshold"], set()).add(r["component"])
    counts = [len(n_comps[t]) for t in sorted(n_comps, reverse=True)]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > counts[-1]


def test_validation(spark):
    scored = _scored(spark)
    with pytest.raises(ValueError):
        components_at_thresholds(scored, [])
    with pytest.raises(ValueError):
        components_at_thresholds(scored, [1.0, 1.0])
