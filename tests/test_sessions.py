"""sessions.py: gap-based sessionize + session_window stats, batch and
streaming."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mismo_spark.sessions import session_stats, sessionize

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows = [(event_id, user_id, minutes_after_t0, value)]"""
    data = [
        (e, u, T0 + dt.timedelta(minutes=m), float(v)) for e, u, m, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, user_id long, ts timestamp_ntz, value double"
    )


def test_sessionize_gap_semantics(spark):
    ev = _events(
        spark,
        [
            # user 1: gaps 10m, 31m (new session), 5m
            (1, 1, 0, 1), (2, 1, 10, 1), (3, 1, 41, 1), (4, 1, 46, 1),
            # user 2: single event
            (5, 2, 0, 1),
            # user 1 boundary: exactly 30m gap stays in-session (strict >)
            (6, 1, 76, 1),
        ],
    )
    got = {
        r["event_id"]: r["session_id"]
        for r in sessionize(
            ev, gap_seconds=1800, tiebreak_col="event_id"
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 2, 6: 2, 5: 1}


def test_sessionize_deterministic_under_ts_ties(spark):
    rows = [(i, 7, 0, 1) for i in range(6)]  # six events, same timestamp
    ev = _events(spark, rows)
    a = sessionize(ev, gap_seconds=60, tiebreak_col="event_id").collect()
    b = sessionize(ev, gap_seconds=60, tiebreak_col="event_id").collect()
    assert sorted((r["event_id"], r["session_id"]) for r in a) == sorted(
        (r["event_id"], r["session_id"]) for r in b
    )
    # all simultaneous events share one session
    assert {r["session_id"] for r in a} == {1}


def test_session_stats_batch(spark):
    ev = _events(
        spark,
        [(1, 1, 0, 2.0), (2, 1, 10, 3.0), (3, 1, 100, 5.0), (4, 2, 0, 7.0)],
    )
    got = session_stats(
        ev, gap="30 minutes", agg_exprs=[F.sum("value").alias("sum_value")]
    ).collect()
    by_key = {(r["user_id"], r["session_start"]): r for r in got}
    s1 = by_key[(1, T0)]
    assert s1["n_events"] == 2 and s1["sum_value"] == 5.0
    # session end = last event + gap
    assert s1["session_end"] == T0 + dt.timedelta(minutes=40)
    s2 = by_key[(1, T0 + dt.timedelta(minutes=100))]
    assert s2["n_events"] == 1 and s2["sum_value"] == 5.0
    assert (2, T0) in by_key


def test_session_stats_streaming(spark, tmp_path):
    """The same session_window expression under Structured Streaming:
    file source → watermark → append-mode sink; closed sessions match
    the batch result."""
    src = str(tmp_path / "src")
    ev = _events(
        spark,
        [(1, 1, 0, 1.0), (2, 1, 5, 1.0), (3, 1, 120, 1.0), (4, 1, 600, 1.0)],
    )
    # watermarks require TIMESTAMP (with zone), not TIMESTAMP_NTZ
    ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(ev.schema).parquet(src).withWatermark(
        "ts", "1 minute"
    )
    agg = session_stats(
        stream, gap="30 minutes", agg_exprs=[F.sum("value").alias("sum_value")]
    )
    out = str(tmp_path / "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    batch = session_stats(
        ev, gap="30 minutes", agg_exprs=[F.sum("value").alias("sum_value")]
    )
    # append mode emits only sessions the watermark has closed: every
    # emitted row must match the batch computation exactly
    emitted = {tuple(r) for r in got.collect()}
    expected = {tuple(r) for r in batch.collect()}
    assert emitted <= expected
    # the early sessions are closed by the final watermark (t=600m)
    assert len(emitted) >= 2
