"""spark-submit job entry points run in-process (the driver's
`--py-files` path is exercised by importing the job module and calling
``main`` with local paths, sharing the test SparkSession via
``getOrCreate``)."""

from __future__ import annotations

import json
import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jobs.prep_training_data import main as prep_main

SF_DIR = "/root/testdata/sf0.001"


def test_prep_training_data_funnel(spark, tmp_path):
    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", f"{SF_DIR}/documents.parquet",
        "--output", out,
        "--id-col", "doc_id",
        "--langs", "en,de,es,fr",
        "--min-tokens", "1",
        "--min-jaccard", "0.5",
    ])
    # funnel counters must be monotonically non-increasing
    order = [
        "input_docs", "after_lang_filter", "after_quality_filter",
        "after_exact_dedupe", "after_neardup_dedupe", "written_docs",
    ]
    vals = [counters[k] for k in order if k in counters]
    assert vals == sorted(vals, reverse=True) or all(
        a >= b for a, b in zip(vals, vals[1:])
    )
    assert counters["written_docs"] > 0
    # counters.json written next to the parquet
    with open(f"{out}/counters.json") as f:
        assert json.load(f)["written_docs"] == counters["written_docs"]
    # curated output is readable and id-unique
    got = spark.read.parquet(f"{out}/documents.parquet")
    assert got.count() == counters["written_docs"]
    assert got.select("doc_id").distinct().count() == counters["written_docs"]


def test_prep_training_data_deterministic(spark, tmp_path):
    outs = []
    for name in ("a", "b"):
        out = str(tmp_path / name)
        prep_main([
            "--input", f"{SF_DIR}/documents.parquet",
            "--output", out,
            "--id-col", "doc_id",
            "--skip-neardup",
        ])
        ids = {
            r["doc_id"]
            for r in spark.read.parquet(f"{out}/documents.parquet")
            .select("doc_id").collect()
        }
        outs.append(ids)
    assert outs[0] == outs[1]


def test_prep_training_data_decontaminate_and_boilerplate(spark, tmp_path):
    # benchmark = a deterministic slice of the same docs -> those docs
    # (and any doc sharing a 3-gram with them) must be dropped
    bench_path = str(tmp_path / "bench.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs.filter(F.col("doc_id") % 11 == 0).select("text").write.parquet(bench_path)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", f"{SF_DIR}/documents.parquet",
        "--output", out,
        "--id-col", "doc_id",
        "--skip-neardup",
        "--benchmark", bench_path,
        "--decontaminate-ngram", "3",
        "--max-boilerplate-frac", "0.99",
        "--boilerplate-ngram", "3",
    ])
    assert "after_decontamination" in counters
    assert "after_boilerplate_filter" in counters
    assert counters["after_decontamination"] <= counters["after_boilerplate_filter"]
    assert counters["written_docs"] == counters["after_decontamination"]
    # every benchmark doc's text is gone from the curated output
    got = spark.read.parquet(f"{out}/documents.parquet")
    bench_texts = {r["text"] for r in spark.read.parquet(bench_path).collect()}
    kept_texts = {r["text"] for r in got.select("text").collect()}
    assert not (bench_texts & kept_texts)


def test_prep_training_data_repetition_filters(spark, tmp_path):
    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", f"{SF_DIR}/documents.parquet",
        "--output", out,
        "--id-col", "doc_id",
        "--skip-neardup",
        "--max-dup-line-frac", "0.9",
        "--max-dup-ngram-frac", "0.95",
    ])
    assert "after_dup_line_filter" in counters
    assert "after_dup_ngram_filter" in counters
    assert counters["after_dup_ngram_filter"] <= counters["after_dup_line_filter"]
    assert counters["written_docs"] == counters["after_dup_ngram_filter"]
    assert counters["written_docs"] > 0


def test_prep_training_data_c4_and_pii(spark, tmp_path):
    src = str(tmp_path / "docs.parquet")
    rows = [
        # survives C4, has an email to redact
        (1, "A proper sentence with j.doe@corp.example.com inside it.\n"
            "Another good line follows here.", "en"),
        # all lines fail C4 (no terminal punctuation) -> dropped
        (2, "no punctuation here at all", "en"),
        # lorem ipsum flag -> dropped
        (3, "Lorem ipsum dolor sit amet consectetur.", "en"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(src)

    out = str(tmp_path / "curated")
    counters = prep_main([
        "--input", src,
        "--output", out,
        "--id-col", "doc_id",
        "--langs", "en",
        "--min-tokens", "1",
        "--skip-neardup",
        "--c4-clean",
        "--redact-pii",
    ])
    assert counters["after_c4_clean"] == 1
    got = spark.read.parquet(f"{out}/documents.parquet").collect()
    assert len(got) == 1 and got[0]["doc_id"] == 1
    assert "<EMAIL>" in got[0]["text"]
    assert "corp.example.com" not in got[0]["text"]
