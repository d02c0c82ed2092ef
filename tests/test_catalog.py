"""Iceberg-gated table IO: availability gate + parquet/table fallbacks."""

from __future__ import annotations

import os


def test_iceberg_gate_is_false_without_runtime(spark):
    from mismo_spark.catalog import iceberg_available

    assert iceberg_available(spark) is False


def test_target_classification():
    from mismo_spark.catalog import is_table_identifier

    assert is_table_identifier("local.db.links")
    assert not is_table_identifier("/tmp/x/links.parquet")
    assert not is_table_identifier("links")  # bare name -> path-ish


def test_write_read_parquet_path(spark, tmp_path):
    from mismo_spark.catalog import read_table, snapshot_id, write_table

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    target = os.path.join(str(tmp_path), "t.parquet")
    write_table(df, target)
    back = read_table(spark, target)
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]
    write_table(df, target, mode="append")
    assert read_table(spark, target).count() == 4
    assert snapshot_id(spark, target) is None


def test_write_read_session_table(spark):
    from mismo_spark.catalog import read_table, write_table

    df = spark.createDataFrame([(1,)], "id long")
    write_table(df, "default.catalog_io_test")
    assert read_table(spark, "default.catalog_io_test").count() == 1
    spark.sql("DROP TABLE IF EXISTS default.catalog_io_test")


def test_partitioned_write(spark, tmp_path):
    from mismo_spark.catalog import read_table, write_table

    df = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "x")], "id long, p string"
    )
    target = os.path.join(str(tmp_path), "part.parquet")
    write_table(df, target, partition_by=["p"])
    assert os.path.isdir(os.path.join(target, "p=x"))
    assert read_table(spark, target).count() == 3
