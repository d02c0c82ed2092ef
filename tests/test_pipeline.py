"""End-to-end dedupe pipeline: F1 gate, resumability, byte-identity.

The BASELINE.json gates at test scale:
* pairwise F1 ≥ 0.99 vs ground truth on the synthetic corpus,
* resumed run produces identical clusters,
* extracted text byte-identical per url across runs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mismo_spark.cluster.metrics import pairwise_prf
from mismo_spark.corpus import extract_text, make_corpus
from mismo_spark.pipeline import DedupePipeline, normalized_domain


@pytest.fixture(scope="module")
def corpus(spark):
    return make_corpus(spark, n_entities=300, seed=42, skew_every=100).cache()


def test_corpus_is_deterministic(spark, corpus):
    again = make_corpus(spark, n_entities=300, seed=42, skew_every=100)
    assert corpus.exceptAll(again).count() == 0
    assert again.exceptAll(corpus).count() == 0
    # urls unique
    assert corpus.select("url").distinct().count() == corpus.count()


def test_extracted_text_byte_identical(corpus):
    """input_hint invariant: extraction(html) == text, byte-for-byte,
    checked via sha2 equality."""
    bad = corpus.withColumn("ex", extract_text(F.col("html"))).filter(
        F.sha2(F.col("ex"), 256) != F.sha2(F.col("text"), 256)
    )
    assert bad.count() == 0


def test_normalized_domain():
    pass  # covered via pipeline; direct golden below


def test_normalized_domain_golden(spark):
    df = spark.createDataFrame(
        [("https://www.Example.com/a/b",), ("http://sub.site.org/x",)], "url string"
    )
    got = [r["d"] for r in df.select(normalized_domain(F.col("url")).alias("d")).collect()]
    assert got == ["example.com", "sub.site.org"]


def test_pipeline_f1_gate(spark, corpus, tmp_path):
    pipe = DedupePipeline(work_dir=str(tmp_path / "run1"), seed=42)
    components = pipe.run(spark, corpus.drop("label_true"))
    truth = corpus.select(F.col("url").alias("record_id"), "label_true")
    assigned = components.join(truth, "record_id")
    metrics = pairwise_prf(assigned)
    print("PIPELINE METRICS:", metrics)
    assert metrics["f1"] >= 0.99, metrics


def test_pipeline_resume_identical(spark, corpus, tmp_path):
    work = str(tmp_path / "run2")
    pipe = DedupePipeline(work_dir=work, seed=42)
    c1 = pipe.run(spark, corpus.drop("label_true"))
    first = {(r["record_id"], r["component"]) for r in c1.collect()}

    # resume: a fresh pipeline over the same work_dir replays all stages
    # from checkpoints (fingerprints match) — identical output
    pipe2 = DedupePipeline(work_dir=work, seed=42)
    c2 = pipe2.run(spark, corpus.drop("label_true"))
    second = {(r["record_id"], r["component"]) for r in c2.collect()}
    assert first == second

    # manifest carries per-stage rows + per-partition counters
    import json, os

    with open(os.path.join(work, "manifest.json")) as f:
        manifest = json.load(f)
    for stage in ["01_records", "02_links", "03_compared", "04_scored", "05_matches", "06_components"]:
        assert stage in manifest["stages"]
        assert manifest["stages"][stage]["rows"] > 0
        assert manifest["stages"][stage]["partition_counts"]


def test_pipeline_skew_split_identical_clusters(spark, corpus, tmp_path):
    """Explicit skew splitting is a physical-plan change only: the same
    corpus clusters identically with domain-key salting forced on
    (budget low enough that the skew_every=100 mega-domains tile)."""
    plain = DedupePipeline(
        work_dir=str(tmp_path / "plain"), seed=42, checkpoint=False
    ).run(spark, corpus.drop("label_true"))
    salted = DedupePipeline(
        work_dir=str(tmp_path / "salted"),
        seed=42,
        checkpoint=False,
        skew_split_pairs=50,
    ).run(spark, corpus.drop("label_true"))
    a = {(r["record_id"], r["component"]) for r in plain.collect()}
    b = {(r["record_id"], r["component"]) for r in salted.collect()}
    assert a == b
