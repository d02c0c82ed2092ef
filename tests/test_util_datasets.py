"""_util helpers + Datasets (mismo/_util.py, mismo/_datasets.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mismo_spark._util import (
    cases,
    group_id,
    join_lookup,
    n_naive_comparisons,
    rename_all,
    sample_table,
)
from mismo_spark.types.datasets import Datasets


def test_cases(spark):
    df = spark.createDataFrame([(1,), (5,), (50,)], "x long")
    out = [
        r["v"]
        for r in df.select(
            cases(
                [(F.col("x") < 3, F.lit("small")), (F.col("x") < 10, F.lit("mid"))],
                F.lit("big"),
            ).alias("v")
        ).collect()
    ]
    assert out == ["small", "mid", "big"]


def test_rename_all(t1):
    out = rename_all(t1, "_l", exclude=["record_id"])
    assert set(out.columns) == {"record_id", "int_l", "letter_l", "array_l"}


def test_join_lookup_defaults(spark):
    left = spark.createDataFrame([(1, "a"), (2, "zz")], "id long, k string")
    lookup = spark.createDataFrame([("a", 10.0)], "k string, v double")
    out = join_lookup(left, lookup, "k", defaults={"v": F.lit(-1.0)})
    got = {r["id"]: r["v"] for r in out.collect()}
    assert got == {1: 10.0, 2: -1.0}


def test_sample_table_methods(spark):
    df = spark.range(1000).withColumn("x", F.col("id") * 2)
    h1 = sample_table(df, 50, method="hash", seed=1)
    h2 = sample_table(df, 50, method="hash", seed=1)
    assert h1.count() == 50
    assert h1.exceptAll(h2).count() == 0  # deterministic
    r = sample_table(df, 100, method="row", seed=1)
    assert 40 <= r.count() <= 200
    b = sample_table(df.repartition(10), 100, method="block")
    assert 0 < b.count() <= 1000


def test_group_id(spark):
    df = spark.createDataFrame([("a", 1), ("a", 1), ("b", 2)], "k string, n long")
    out = group_id(df, ["k", "n"])
    rows = out.collect()
    codes = {(r["k"], r["n"]): r["group_id"] for r in rows}
    assert codes[("a", 1)] != codes[("b", 2)]
    assert len({r["group_id"] for r in rows}) == 2


def test_n_naive():
    assert n_naive_comparisons(10) == 45
    assert n_naive_comparisons(10, 20) == 200


def test_datasets(spark):
    a = spark.createDataFrame([(1, "x", 1.0)], "record_id long, s string, f double")
    b = spark.createDataFrame([(2, "y", True)], "record_id long, s string, f boolean")
    ds = Datasets({"a": a, "b": b})
    assert ds.names == ["a", "b"]
    # f has conflicting types → excluded from shared schema
    assert [n for n, _ in ds.shared_schema()] == ["record_id", "s"]
    uni = ds.unioned()
    assert set(uni.columns) == {"record_id", "s", "dataset"}
    assert uni.count() == 2
    assert ds.all_record_ids().count() == 2


def test_stratified_sample_deterministic_and_rated(spark):
    from mismo_spark._util import stratified_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(10000)],
        "record_id long, src string",
    )
    s1 = stratified_sample(df, {"a": 0.3, "b": 0.05}, strata_col="src")
    s2 = stratified_sample(
        df.repartition(13), {"a": 0.3, "b": 0.05}, strata_col="src"
    )
    ids1 = sorted(r["record_id"] for r in s1.collect())
    assert ids1 == sorted(r["record_id"] for r in s2.collect())
    counts = {
        r["src"]: r["n"]
        for r in s1.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert abs(counts["a"] / 5000 - 0.3) < 0.03
    assert abs(counts["b"] / 5000 - 0.05) < 0.02
    # strata not in the dict are dropped entirely
    s3 = stratified_sample(df, {"a": 1.0}, strata_col="src")
    assert s3.filter(F.col("src") == "b").count() == 0
    # map-only: no exchange in the plan
    plan = s1._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_write_sized_parquet(spark, tmp_path):
    import glob

    from pyspark.sql import functions as F

    from mismo_spark._util import write_sized_parquet

    df = spark.range(10_000).select(
        "id", F.repeat(F.lit("x"), 200).alias("pad")
    ).repartition(64)
    path = str(tmp_path / "sized")
    # ~10k * ~220B ≈ 2.2MB raw -> far below one 256MB target file
    n = write_sized_parquet(df, path, target_mb=256)
    assert n == 1
    files = glob.glob(f"{path}/part-*.parquet")
    assert len(files) == 1
    assert spark.read.parquet(path).count() == 10_000

    # tiny target forces multiple files, growing past the current 2
    df2 = df.coalesce(2)
    path2 = str(tmp_path / "sized2")
    n2 = write_sized_parquet(df2, path2, target_mb=1, compression_ratio=1.0)
    assert n2 >= 2
    assert len(glob.glob(f"{path2}/part-*.parquet")) == n2
    assert spark.read.parquet(path2).count() == 10_000

    # empty frame still writes a readable dataset
    path3 = str(tmp_path / "sized3")
    assert write_sized_parquet(df.where(F.lit(False)), path3) == 1
    assert spark.read.parquet(path3).count() == 0
