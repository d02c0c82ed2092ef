"""Set / tf-idf / vector function semantics (mismo/sets, mismo/vector)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mismo_spark.sets.compare import jaccard
from mismo_spark.sets.tfidf import (
    add_array_value_counts,
    add_tfidf,
    document_counts,
    rare_terms,
    term_idf,
)
from mismo_spark.vector import cosine_similarity, dot, dot_maps, norm, normalize


def test_jaccard(spark):
    df = spark.createDataFrame(
        [(["a", "b"], ["b", "c"]), (["a"], ["b"]), (["a", "a", "b"], ["a", "b"])],
        "a array<string>, b array<string>",
    )
    vals = [r["v"] for r in df.select(jaccard(F.col("a"), F.col("b")).alias("v")).collect()]
    assert vals[0] == pytest.approx(1 / 3)
    assert vals[1] == 0.0
    assert vals[2] == pytest.approx(1.0)  # distinct-element semantics


def test_document_counts_and_idf(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "a"]), (2, ["b", "c"]), (3, ["b"])],
        "record_id long, terms array<string>",
    )
    dc = {r["term"]: r["n_records"] for r in document_counts(df, "terms").collect()}
    assert dc == {"a": 1, "b": 3, "c": 1}
    idf = {r["term"]: r["idf"] for r in term_idf(df, "terms").collect()}
    assert idf["b"] == pytest.approx(0.0)
    assert idf["a"] == pytest.approx(math.log(3.0))


def test_add_array_value_counts(spark):
    df = spark.createDataFrame([(1, ["a", "b", "a"])], "record_id long, terms array<string>")
    row = add_array_value_counts(df, "terms").collect()[0]
    assert row["term_counts"] == {"a": 2, "b": 1}


def test_add_tfidf_l2_normalized(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b"]), (3, ["c"])],
        "record_id long, terms array<string>",
    )
    out = {r["record_id"]: r["tfidf"] for r in add_tfidf(df, "terms").collect()}
    # record 1: idf(a)=ln3, idf(b)=ln(3/2); L2 norm = 1
    v = out[1]
    assert sum(x * x for x in v.values()) == pytest.approx(1.0)
    assert v["a"] > v["b"]


def test_rare_terms(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["b"]), (3, ["b", "c"])],
        "record_id long, terms array<string>",
    )
    rt = {r["term"] for r in rare_terms(df, "terms", max_records_n=1).collect()}
    assert rt == {"a", "c"}


def test_vector_ops(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 5.0, 6.0])], "a array<double>, b array<double>"
    )
    row = df.select(
        dot(F.col("a"), F.col("b")).alias("dot"),
        norm(F.col("a")).alias("l2"),
        norm(F.col("a"), "l1").alias("l1"),
        cosine_similarity(F.col("a"), F.col("b")).alias("cos"),
        normalize(F.col("a")).alias("unit"),
    ).collect()[0]
    assert row["dot"] == pytest.approx(32.0)
    assert row["l2"] == pytest.approx(math.sqrt(14.0))
    assert row["l1"] == pytest.approx(6.0)
    assert row["cos"] == pytest.approx(32.0 / (math.sqrt(14) * math.sqrt(77)))
    assert sum(x * x for x in row["unit"]) == pytest.approx(1.0)


def test_dot_maps(spark):
    df = spark.createDataFrame(
        [({"a": 1.0, "b": 2.0}, {"b": 3.0, "c": 4.0})],
        "a map<string,double>, b map<string,double>",
    )
    row = df.select(dot_maps(F.col("a"), F.col("b")).alias("v")).collect()[0]
    assert row["v"] == pytest.approx(6.0)
