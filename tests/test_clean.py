"""textqa.clean: C4 line rules, doc flags, PII redaction."""

from __future__ import annotations

from pyspark.sql import functions as F

from mismo_spark.textqa.clean import c4_clean_lines, c4_doc_flags, redact_pii


def _one(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr(F.col("text")).alias("out")).collect()[0]["out"]


def test_c4_line_rules(spark):
    text = "\n".join(
        [
            "This is a good sentence.",          # kept
            "Short line.",                        # < 3 words
            "no terminal punctuation here",       # no punctuation
            "Please enable javascript to view.",  # boilerplate
            "We use cookie tracking everywhere.", # boilerplate
            'He said "stop right there."',        # kept (quote end)
            "Is this a question?",                # kept
        ]
    )
    got = _one(spark, text, c4_clean_lines)
    assert got.split("\n") == [
        "This is a good sentence.",
        'He said "stop right there."',
        "Is this a question?",
    ]
    assert _one(spark, None, c4_clean_lines) is None
    assert _one(spark, "no lines survive", c4_clean_lines) == ""


def test_c4_doc_flags(spark):
    f = _one(spark, "Lorem Ipsum dolor sit.", c4_doc_flags)
    assert f["has_lorem_ipsum"] and not f["has_curly_brace"]
    f = _one(spark, "function f() { return 1; }", c4_doc_flags)
    assert f["has_curly_brace"] and not f["has_lorem_ipsum"]


def test_redact_pii(spark):
    got = _one(
        spark,
        "Mail jane.doe+x@corp.example.co, call +1 555-010-4477, "
        "server at 10.1.2.3 responded.",
        redact_pii,
    )
    assert got == "Mail <EMAIL>, call <PHONE>, server at <IP> responded."


def test_redact_pii_idempotent(spark):
    text = "a@b.co 10.0.0.1 +44 20 7946 0958 end"
    once = _one(spark, text, redact_pii)
    twice = _one(spark, once, lambda c: redact_pii(c))
    assert once == twice


def test_clean_is_map_only(spark):
    df = spark.createDataFrame([("A line here.",)], "text string")
    out = df.select(
        c4_clean_lines(F.col("text")).alias("c"),
        redact_pii(F.col("text")).alias("r"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_gopher_rules(spark):
    from mismo_spark.textqa.gopher import gopher_rules

    good = (
        "The quick brown fox jumps over the lazy dog and then runs away "
        "to have a rest with friends near the old barn that stands "
        "beyond the river of time and be happy about all of it today. "
        "More plain words follow to reach the minimum count of fifty "
        "words in total for this document right now indeed truly."
    )
    bullets = "\n".join(["* item one here now"] * 10)
    symbols = "## " * 60
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, symbols), (4, "to the of and")],
        "record_id long, text string",
    )
    got = {
        r["record_id"]: r["g"]
        for r in df.select(
            "record_id", gopher_rules(F.col("text")).alias("g")
        ).collect()
    }
    assert got[1]["passes"]
    assert not got[2]["bullet_frac_ok"] and not got[2]["passes"]
    assert not got[3]["symbol_ratio_ok"] and not got[3]["passes"]
    # stopwords fine but word count too low
    assert got[4]["stopwords_ok"] and not got[4]["word_count_ok"]
