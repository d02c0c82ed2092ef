"""Deterministic and cluster-safe dataset splits."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mismo_spark.splits import assign_splits, cluster_safe_splits

FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_assign_splits_deterministic_and_python_replay(spark):
    df = spark.range(2000).withColumnRenamed("id", "record_id")
    a = {r["record_id"]: r["split"] for r in assign_splits(df, FRACS).collect()}
    b = {r["record_id"]: r["split"] for r in assign_splits(df, FRACS).collect()}
    assert a == b
    # exact python replay of the md5 bucket rule
    for rid in (0, 1, 999, 1999):
        h = int(hashlib.md5(f"{rid}|42".encode()).hexdigest()[:8], 16)
        u = h / float(1 << 32)
        want = "train" if u < 0.8 else ("val" if u < 0.9 else "test")
        assert a[rid] == want
    # proportions roughly honored
    counts = {s: 0 for s in FRACS}
    for s in a.values():
        counts[s] += 1
    assert 0.75 < counts["train"] / 2000 < 0.85
    assert counts["val"] + counts["test"] == 2000 - counts["train"]


def test_cluster_safe_never_straddles(spark):
    docs = spark.range(300).withColumnRenamed("id", "record_id")
    assignments = spark.range(300).select(
        F.col("id").alias("record_id"), (F.col("id") % 37).alias("component")
    )
    out = cluster_safe_splits(docs, assignments, FRACS).collect()
    by_comp = {}
    for r in out:
        by_comp.setdefault(r["component"], set()).add(r["split"])
    assert all(len(s) == 1 for s in by_comp.values())
    assert len({next(iter(s)) for s in by_comp.values()}) > 1


def test_unassigned_docs_are_singletons(spark):
    docs = spark.createDataFrame([(1,), (2,)], "record_id long")
    assignments = spark.createDataFrame(
        [(1, 1)], "record_id long, component long"
    )
    rows = {r["record_id"]: r for r in cluster_safe_splits(docs, assignments, FRACS).collect()}
    assert rows[1]["component"] == 1
    assert rows[2]["component"] is None  # singleton, hashed by its own id
    assert rows[2]["split"] in FRACS


def test_fraction_validation(spark):
    df = spark.range(3).withColumnRenamed("id", "record_id")
    with pytest.raises(ValueError):
        assign_splits(df, {"train": 0.5, "test": 0.4})
    with pytest.raises(ValueError):
        assign_splits(df, {})
    with pytest.raises(ValueError):
        assign_splits(df, {"a": 1.5, "b": -0.5})


def test_split_leakage_audit(spark):
    from mismo_spark.splits import cluster_safe_splits, split_leakage_audit

    docs = spark.createDataFrame(
        [(i,) for i in range(40)], "record_id long"
    )
    pairs = spark.createDataFrame(
        [(i, i + 20) for i in range(20)],
        "record_id_l long, record_id_r long",
    )
    comps = spark.createDataFrame(
        [(i, i % 20) for i in range(40)], "record_id long, component long"
    )
    safe = cluster_safe_splits(docs, comps, {"train": 0.7, "test": 0.3})
    audit = split_leakage_audit(safe, pairs).collect()
    # cluster-safe splits: zero cross-split pairs by construction
    assert all(not r["leaked"] for r in audit)
    assert sum(r["n_pairs"] for r in audit) == 20

    # per-ROW splits (leakage-prone): the audit must surface straddlers
    from mismo_spark.splits import assign_splits

    naive = assign_splits(docs, {"train": 0.5, "test": 0.5})
    audit2 = {
        (r["split_l"], r["split_r"]): r["n_pairs"]
        for r in split_leakage_audit(naive, pairs).collect()
    }
    assert sum(audit2.values()) == 20
    assert audit2.get(("test", "train"), 0) > 0  # leakage detected
