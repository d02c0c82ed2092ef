"""profile.profile_numeric + _util.keep_latest."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mismo_spark._util import keep_latest
from mismo_spark.profile import profile_numeric


def test_keep_latest_per_key(spark):
    t = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", t, "old"),
        ("u1", t + dt.timedelta(days=2), "new"),
        ("u2", t, "only"),
        ("u3", t, "tie-a"),
        ("u3", t, "tie-b"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp_ntz, body string")
    got = {
        r["url"]: r["body"]
        for r in keep_latest(df, tiebreak_col="body").collect()
    }
    assert got == {"u1": "new", "u2": "only", "u3": "tie-b"}
    assert keep_latest(df, tiebreak_col="body").count() == 3


def test_profile_numeric_one_pass(spark):
    df = spark.createDataFrame(
        [(float(i), i % 3 if i % 5 else None) for i in range(1, 101)],
        "a double, b int",
    )
    prof = {r["column"]: r for r in profile_numeric(df, ["a", "b"]).collect()}
    a = prof["a"]
    assert a["n"] == 100 and a["n_null"] == 0 and a["n_distinct"] == 100
    assert a["min"] == 1.0 and a["max"] == 100.0
    assert a["mean"] == pytest.approx(50.5)
    assert a["p50"] == pytest.approx(50.5)
    assert a["p95"] == pytest.approx(95.05)
    b = prof["b"]
    assert b["n_null"] == 20 and b["n"] == 80
    assert b["n_distinct"] == 3
    # single aggregation job: exactly one row pre-stack means no
    # per-column scans; the plan shows one HashAggregate pair
    plan = (
        profile_numeric(df, ["a", "b"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan ExistingRDD") <= 1


def test_pipeline_keep_latest_snapshots(spark, tmp_path):
    """Recrawled pages (same url, newer warc_ts) collapse to the newest
    capture before record derivation."""
    from mismo_spark.corpus import make_corpus
    from mismo_spark.pipeline import DedupePipeline

    pages = make_corpus(spark, n_entities=30, seed=42).drop("label_true")
    recrawl = pages.limit(20).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 DAYS")
    )
    both = pages.unionByName(recrawl)
    pipe = DedupePipeline(
        work_dir=str(tmp_path / "wk"),
        checkpoint=False,
        keep_latest_snapshots=True,
    )
    records = pipe.prepare_records(both)
    assert records.count() == pages.count()
    assert records.select("record_id").distinct().count() == pages.count()


def test_histogram_equi_width(spark):
    from mismo_spark.profile import histogram

    df = spark.createDataFrame(
        [(float(i),) for i in range(100)] + [(None,)], "x double"
    )
    h = {r["bin"]: r for r in histogram(df, "x", bins=10).collect()}
    assert len(h) == 10
    assert sum(r["n"] for r in h.values()) == 100
    # max value (99.0) lands in the last bin (upper edge inclusive)
    assert h[9]["n"] == 10
    assert h[0]["lo"] == 0.0 and abs(h[9]["hi"] - 99.0) < 1e-9
