"""ngram decontamination + boilerplate duplicated-ngram fraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mismo_spark.textqa.contamination import (
    doc_ngrams,
    duplicated_ngram_fraction,
    ngram_contamination,
)


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "pack my box with five dozen liquor jugs"),
            (3, "the quick brown fox naps all day long today"),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )


def test_doc_ngrams_distinct_and_short_doc(spark, docs):
    out = doc_ngrams(docs, n=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], set()).add(r["ngram"])
    assert "the quick brown" in by_doc[1]
    assert "the quick brown" in by_doc[3]
    # shorter than n -> whole text as a single gram
    assert by_doc[4] == {"tiny"}
    # distinct per doc
    assert len(out) == sum(len(v) for v in by_doc.values())


def test_contamination_against_benchmark(spark, docs):
    bench = spark.createDataFrame(
        [("the quick brown fox says hello",)], "text string"
    )
    out = {
        r["doc_id"]: r
        for r in ngram_contamination(docs, bench, n=3).collect()
    }
    # docs 1 and 3 share "the quick brown" / "quick brown fox"
    assert out[1]["n_contaminated"] == 2
    assert out[3]["n_contaminated"] == 2
    assert out[2]["n_contaminated"] == 0
    assert out[4]["n_contaminated"] == 0
    assert out[2]["contamination_frac"] == 0.0
    assert 0 < out[1]["contamination_frac"] < 1
    # every doc is present with its total
    assert out[1]["n_ngrams"] == 7


def test_duplicated_ngram_fraction(spark, docs):
    out = {
        r["doc_id"]: r
        for r in duplicated_ngram_fraction(docs, n=3, min_df=2).collect()
    }
    # "the quick brown" + "quick brown fox" appear in docs 1 and 3
    assert out[1]["n_duplicated"] == 2
    assert out[3]["n_duplicated"] == 2
    assert out[2]["n_duplicated"] == 0
    assert out[4]["n_duplicated"] == 0
    assert out[1]["duplicated_frac"] == pytest.approx(2 / 7)


def test_contamination_broadcast_plan(spark, docs):
    bench = spark.createDataFrame([("the quick brown fox",)], "text string")
    plan = (
        ngram_contamination(docs, bench, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
