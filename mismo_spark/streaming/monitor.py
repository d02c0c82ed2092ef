"""Event-time windowed crawl monitoring with late-data watermarks.

The input_hint's stream shape is Common-Crawl-style pages
(url, warc_ts, html, text, lang) arriving in crawl batches whose
event times (``warc_ts``) straggle: a fetcher retries for minutes to
hours after the bulk of a crawl window has landed.  The Spark-native
expression is a watermarked event-time windowed aggregation:

* ``withWatermark(ts, delay)`` bounds how late a page may arrive and
  lets the engine finalize + garbage-collect window state;
* windows are per (event-time window, normalized domain) — the same
  blocking key the batch pipeline uses, so a spike in a domain's
  duplicate rate is visible in the same coordinates the deduper works
  in;
* duplicate pressure is ``approx_count_distinct`` over the text
  fingerprint (HyperLogLog++ — streaming-safe, constant state per
  group; an exact distinct would need unbounded per-window state).

Scale: state is one HLL sketch + two counters per (window, domain)
group, partitioned by group key across executors; the watermark bounds
state lifetime, so steady-state memory is O(active windows × domains),
independent of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark.pipeline import normalized_domain


def crawl_stats_stream(
    pages: DataFrame,
    *,
    ts_column: str = "warc_ts",
    text_column: str = "text",
    url_column: str = "url",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
    exact: bool = False,
) -> DataFrame:
    """Streaming per-(window, domain) crawl statistics.

    → (window struct, domain, n_pages, approx_distinct_texts,
    dup_rate) where dup_rate = 1 − distinct/total.  Works on a
    streaming OR batch DataFrame (watermark is a no-op in batch).

    Append-mode sinks emit each window once its watermark passes —
    exactly the "windowed aggs for late data" contract: rows later
    than ``watermark`` behind the max seen event time are dropped,
    everything else lands in its event-time window regardless of
    arrival order.
    """
    wcol = (
        F.window(F.col(ts_column), window, slide)
        if slide
        else F.window(F.col(ts_column), window)
    )
    stream = pages.withWatermark(ts_column, watermark)
    agg = (
        stream.select(
            F.col(ts_column),
            normalized_domain(F.col(url_column)).alias("domain"),
            F.xxhash64(F.col(text_column)).alias("__fp"),
        )
        .groupBy(wcol.alias("window"), "domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            # exact distinct is unsupported (and unbounded-state) in
            # streaming; it's offered for BATCH diagnostics runs where
            # exact numbers are wanted (and SQL-oracle-checkable)
            (
                F.count_distinct("__fp")
                if exact
                else F.approx_count_distinct("__fp")
            ).alias("approx_distinct_texts"),
        )
    )
    return agg.withColumn(
        "dup_rate",
        F.round(
            1.0 - F.col("approx_distinct_texts") / F.col("n_pages"), 6
        ),
    )
