"""Scalar text-function goldens — FIXTURES.md F8
(mismo/text/_similarity.py, mismo/text/_features.py doctests)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mismo_spark.text.features import ngrams, tokenize
from mismo_spark.text.similarity import (
    damerau_levenshtein,
    jaro_similarity,
    jaro_winkler_similarity,
    levenshtein_ratio,
)
from mismo_spark.text.strings import norm_whitespace, strip_accents


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def pairs_vals(spark, data, fn):
    df = spark.createDataFrame(data, "a string, b string")
    return [r["v"] for r in df.select(fn(F.col("a"), F.col("b")).alias("v")).collect()]


def test_levenshtein_ratio(spark):
    vals = pairs_vals(
        spark,
        [("mile", "mike"), ("mile", ""), ("", "")],
        levenshtein_ratio,
    )
    assert vals[0] == pytest.approx(0.75)
    assert vals[1] == pytest.approx(0.0)
    assert vals[2] is None or math.isnan(vals[2])  # 0/0


def test_jaro_winkler_golden(spark):
    vals = pairs_vals(
        spark,
        [("foo", "food"), ("foo", "foo"), ("foo", ""), (None, "x")],
        jaro_winkler_similarity,
    )
    assert vals[0] == pytest.approx(0.9416666666666667)
    assert vals[1] == 1.0
    assert vals[2] == 0.0
    assert math.isnan(vals[3])


def test_jaro_matches_duckdb(spark):
    """Cross-check our Jaro/JW kernels against DuckDB's builtins on a
    word grid — the same builtins the reference calls
    (mismo/text/_similarity.py:112-148)."""
    import duckdb

    words = ["martha", "marhta", "dixon", "dicksonx", "jellyfish", "smellyfish",
             "apple", "appel", "zebra", "z", "abcdef", "fedcba"]
    grid = [(a, b) for a in words for b in words]
    con = duckdb.connect()
    duck = [
        con.execute(
            "select jaro_similarity(?, ?), jaro_winkler_similarity(?, ?)",
            [a, b, a, b],
        ).fetchone()
        for a, b in grid
    ]
    df = spark.createDataFrame(grid, "a string, b string")
    ours = df.select(
        jaro_similarity(F.col("a"), F.col("b")).alias("j"),
        jaro_winkler_similarity(F.col("a"), F.col("b")).alias("jw"),
    ).collect()
    for (dj, djw), row in zip(duck, ours):
        assert row["j"] == pytest.approx(dj, abs=1e-9)
        assert row["jw"] == pytest.approx(djw, abs=1e-9)


def test_damerau_levenshtein(spark):
    df = spark.createDataFrame(
        [("abc", "acb"), ("abc", "abc"), ("kitten", "sitting"), (None, "x")],
        "a string, b string",
    )
    vals = [
        r["v"]
        for r in df.select(damerau_levenshtein(F.col("a"), F.col("b")).alias("v")).collect()
    ]
    assert vals[0] == 1.0  # one transposition
    assert vals[1] == 0.0
    assert vals[2] == 3.0
    assert vals[3] is None


def test_tokenize(spark):
    df = spark.createDataFrame([("  abc    def",), (" ",), (None,)], "s string")
    vals = [r["v"] for r in df.select(tokenize(F.col("s")).alias("v")).collect()]
    assert vals[0] == ["abc", "def"]
    assert vals[1] == []
    assert vals[2] is None


def test_ngrams(spark):
    df = spark.createDataFrame([("abcdef",), ("a",), (None,)], "s string")
    vals = [r["v"] for r in df.select(ngrams(F.col("s"), 3).alias("v")).collect()]
    assert set(vals[0]) == {"abc", "bcd", "cde", "def"}
    assert vals[1] == []
    assert vals[2] is None


def test_norm_whitespace(spark):
    assert one(spark, norm_whitespace(F.lit("  a   b \t c "))) == "a b c"


def test_strip_accents(spark):
    assert one(spark, strip_accents(F.lit("café Ünïcode"))) == "cafe Unicode"


def test_monge_elkan(spark):
    from mismo_spark.text.similarity import monge_elkan

    df = spark.createDataFrame(
        [
            (["john", "smith"], ["jon", "smyth", "extra"]),
            (["abc"], ["abc"]),
            ([], ["x"]),
            (None, ["x"]),
        ],
        "a array<string>, b array<string>",
    )
    vals = [
        r["v"]
        for r in df.select(
            monge_elkan(F.col("a"), F.col("b")).alias("v")
        ).collect()
    ]
    # john~jon: 1-1/4=0.75 (best in b); smith~smyth: 1-1/5=0.8 -> mean .775
    assert vals[0] == pytest.approx(0.775)
    assert vals[1] == pytest.approx(1.0)
    assert vals[2] == 0.0
    assert vals[3] is None
    # asymmetry: mean over a's 1 token vs mean over b's 3 tokens
    one = spark.createDataFrame(
        [(["abc"], ["abc", "zzz", "qqq"])], "a array<string>, b array<string>"
    )
    fwd = one.select(monge_elkan(F.col("a"), F.col("b")).alias("v")).first()["v"]
    rev = one.select(monge_elkan(F.col("b"), F.col("a")).alias("v")).first()["v"]
    assert fwd == pytest.approx(1.0)
    assert rev < fwd


def test_line_lang_fractions(spark):
    from mismo_spark.textqa import line_lang_fractions

    docs = spark.createDataFrame(
        [
            # 2 en lines + 1 de line -> multilingual, dominant en
            (1, "the cat is in the house for now\n"
                "this is the end of the story\n"
                "der hund ist nicht mit der katze"),
            # pure es
            (2, "el perro que corre por la casa\nla vida es una caja"),
            # gibberish -> und
            (3, "zzz qqq xxx"),
            # empty + whitespace-only lines
            (4, "\n   \n"),
            (5, None),
        ],
        "record_id long, text string",
    )
    rows = {r["record_id"]: r for r in line_lang_fractions(docs).collect()}
    assert len(rows) == 5
    r1 = rows[1]
    assert r1["n_lines"] == 3
    assert r1["frac_en"] == pytest.approx(2 / 3, abs=1e-6)
    assert r1["frac_de"] == pytest.approx(1 / 3, abs=1e-6)
    assert r1["dominant_lang"] == "en"
    assert r1["is_multilingual"] is True
    r2 = rows[2]
    assert (r2["dominant_lang"], r2["is_multilingual"]) == ("es", False)
    assert r2["frac_es"] == pytest.approx(1.0)
    r3 = rows[3]
    assert (r3["dominant_lang"], r3["frac_und"]) == ("und", 1.0)
    for empty_id in (4, 5):
        r = rows[empty_id]
        assert r["n_lines"] == 0
        assert r["dominant_lang"] == "und"
        assert r["is_multilingual"] is False
        assert r["frac_en"] == 0.0
