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


def test_crawl_stats_stream_watermark(spark, tmp_path):
    """Windowed agg with watermark: on-time rows land in their event-time
    windows; a row arriving far behind the watermark is dropped."""
    import datetime as dt

    from mismo_spark.streaming.monitor import crawl_stats_stream

    schema = "url string, warc_ts timestamp, text string"
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def ts(h, m=0):
        return dt.datetime(2026, 1, 1, h, m)

    def drain():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            crawl_stats_stream(stream, window="1 hour", watermark="30 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    b1 = spark.createDataFrame(
        [
            ("http://a.com/1", ts(10, 5), "x"),
            ("http://a.com/2", ts(10, 20), "x"),
            ("http://a.com/3", ts(10, 40), "y"),
            ("http://b.com/1", ts(10, 10), "z"),
        ],
        schema,
    )
    b1.write.mode("append").parquet(in_dir)
    drain()

    # batch 2: the watermark in force is batch 1's max event time minus
    # the delay (10:40 − 30min = 10:10), so the 9:30 row is LATE and
    # must be dropped; the 15:00 row advances the watermark past 11:00,
    # finalizing (and emitting) the 10:00 windows at batch end
    b2 = spark.createDataFrame(
        [
            ("http://a.com/4", ts(15, 0), "w"),
            ("http://a.com/late", ts(9, 30), "late"),  # behind watermark
        ],
        schema,
    )
    b2.write.mode("append").parquet(in_dir)
    drain()
    got = {
        (r["window"]["start"].hour, r["domain"]): (
            r["n_pages"],
            r["approx_distinct_texts"],
        )
        for r in spark.read.parquet(out_dir).collect()
    }
    assert got.get((10, "a.com")) == (3, 2)
    assert got.get((10, "b.com")) == (1, 1)
    # the dropped late row must not have created a 9:00 window
    assert not any(h == 9 for h, _ in got)
