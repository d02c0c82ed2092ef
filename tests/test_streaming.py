"""Structured Streaming incremental linkage (stream-static blocking)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mismo_spark.corpus import make_corpus
from mismo_spark.pipeline import DedupePipeline
from mismo_spark.streaming import incremental_link_stream


def test_incremental_link_stream(spark, tmp_path):
    corpus = make_corpus(spark, n_entities=60, seed=42).drop("label_true").cache()
    # pretend the corpus is clustered: every record its own component
    components = corpus.select(
        F.col("url").alias("record_id"), F.col("url").alias("component")
    )

    # "new crawl batch" = a seeded variant of some of the same entities:
    # same generator, later member index → near-duplicate texts
    incoming_dir = str(tmp_path / "incoming")
    new_pages = make_corpus(spark, n_entities=60, seed=42).drop("label_true")
    # take a disjoint url set (rename member part) so ids differ
    new_pages = new_pages.withColumn(
        "url", F.concat(F.col("url"), F.lit("?recrawl=1"))
    )
    new_pages.limit(200).write.mode("overwrite").parquet(incoming_dir)

    q = incremental_link_stream(
        spark,
        input_dir=incoming_dir,
        corpus=corpus,
        components=components,
        checkpoint_dir=str(tmp_path / "ckpt"),
        output_dir=str(tmp_path / "out"),
        schema=corpus.schema,
    )
    q.awaitTermination(300)

    out = spark.read.parquet(str(tmp_path / "out"))
    assert set(out.columns) == {
        "new_record_id",
        "existing_record_id",
        "existing_component",
    }
    rows = out.collect()
    assert len(rows) > 0
    # a recrawled page must link to its own original url
    self_links = out.filter(
        F.col("new_record_id") == F.concat(F.col("existing_record_id"), F.lit("?recrawl=1"))
    ).count()
    assert self_links > 0
