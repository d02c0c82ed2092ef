"""Corpus-level line dedup: first occurrence survives, short lines
exempt, null/empty text edges."""

from mismo_spark.textqa.line_dedupe import corpus_line_dedupe, duplicated_lines

FOOTER = "all rights reserved by acme corporation"
DOCS = [
    (1, f"unique alpha line one\n{FOOTER}\nshort x"),
    (2, f"{FOOTER}\nunique beta line two"),
    (3, f"unique gamma line three\n{FOOTER}"),
    (4, None),
    (5, ""),
    (6, "short x\nshort x"),  # 2-word line: exempt even when repeated
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_duplicated_lines_inventory(spark):
    rows = duplicated_lines(_df(spark), min_words=3, min_count=2).collect()
    assert len(rows) == 1
    assert rows[0]["n_occurrences"] == 3
    assert rows[0]["n_docs"] == 3
    assert rows[0]["example"] == FOOTER


def test_first_occurrence_survives(spark):
    out = {
        r["doc_id"]: (r["text"], r["n_lines_removed"])
        for r in corpus_line_dedupe(_df(spark), min_words=3).collect()
    }
    # doc 1 has the smallest (id, line_no) occurrence -> keeps it
    assert out[1] == (f"unique alpha line one\n{FOOTER}\nshort x", 0)
    assert out[2] == ("unique beta line two", 1)
    assert out[3] == ("unique gamma line three", 1)
    assert out[4] == (None, 0)
    assert out[5] == ("", 0)
    # short lines are exempt from dedup entirely
    assert out[6] == ("short x\nshort x", 0)


def test_min_count_threshold(spark):
    df = _df(spark)
    # min_count=4: the footer occurs only 3 times -> nothing removed
    out = corpus_line_dedupe(df, min_words=3, min_count=4)
    assert out.agg({"n_lines_removed": "sum"}).collect()[0][0] == 0


def test_whitespace_variants_share_key(spark):
    df = spark.createDataFrame(
        [(1, "  padded dup line here  \nkeep one"), (2, "padded dup line here")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_lines_removed"]
        for r in corpus_line_dedupe(df, min_words=3).collect()
    }
    # trimmed forms match: doc 1 (line_no 0) keeps, doc 2 loses its copy
    assert out == {1: 0, 2: 1}


def test_other_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, "en", f"{FOOTER}\nx y z w"), (2, "de", FOOTER)],
        "doc_id long, lang string, text string",
    )
    rows = {r["doc_id"]: r for r in corpus_line_dedupe(df, min_words=3).collect()}
    assert rows[1]["lang"] == "en" and rows[2]["lang"] == "de"
    assert rows[2]["text"] == ""
    assert rows[2]["n_lines_removed"] == 1
