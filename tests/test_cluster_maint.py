"""Streaming cluster maintenance: live assignment == full recompute."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from mismo_spark.cluster.cc import connected_components
from mismo_spark.linker.key import KeyLinker
from mismo_spark.streaming.cluster_maint import (
    incremental_cluster_stream,
    read_assignments,
)

SCHEMA = "record_id long, key string"


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_incremental_cluster_stream(spark, tmp_path):
    corpus = _df(spark, [(1, "a"), (2, "b")])
    seed_assign = corpus.select(
        "record_id", F.col("record_id").alias("component")
    )
    incoming = str(tmp_path / "incoming")
    batch1 = [(10, "a"), (11, "x"), (12, "x")]
    batch2 = [(20, "b"), (21, "a"), (30, "lonely")]
    _df(spark, batch1).coalesce(1).write.mode("append").parquet(incoming)
    time.sleep(1.1)  # distinct mtimes -> two micro-batches
    _df(spark, batch2).coalesce(1).write.mode("append").parquet(incoming)

    state_dir = str(tmp_path / "state")
    q = incremental_cluster_stream(
        spark,
        input_dir=incoming,
        key_columns=["key"],
        state_dir=state_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        corpus=corpus,
        initial_assignments=seed_assign,
        schema=_df(spark, []).schema,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)

    got = {
        r["record_id"]: r["component"]
        for r in read_assignments(spark, state_dir).collect()
    }
    # reference: cluster everything from scratch in one batch
    everything = corpus.unionByName(_df(spark, batch1 + batch2))
    full = connected_components(
        KeyLinker(["key"], task="dedupe")(everything).links,
        everything.select("record_id"),
    )
    want = {r["record_id"]: r["component"] for r in full.collect()}
    assert got == want
    # sanity on the actual shapes: {1,10,21}, {2,20}, {11,12}, {30}
    assert want == {1: 1, 10: 1, 21: 1, 2: 2, 20: 2, 11: 11, 12: 11, 30: 30}


def test_incremental_cluster_stream_no_seed(spark, tmp_path):
    incoming = str(tmp_path / "incoming")
    _df(spark, [(5, "k"), (6, "k"), (7, "z")]).coalesce(1).write.mode(
        "append"
    ).parquet(incoming)

    state_dir = str(tmp_path / "state")
    assert read_assignments(spark, state_dir) is None
    q = incremental_cluster_stream(
        spark,
        input_dir=incoming,
        key_columns=["key"],
        state_dir=state_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        schema=_df(spark, []).schema,
    )
    q.awaitTermination(300)
    got = {
        r["record_id"]: r["component"]
        for r in read_assignments(spark, state_dir).collect()
    }
    assert got == {5: 5, 6: 5, 7: 7}
