"""EnumComparer.label_column: the least-of-whens form must be
semantically identical to the first-match-wins CASE chain for pure
predicates — including NULL conditions (skipped, like CASE's
NULL-is-not-true) and overlapping conditions (lowest index wins)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mismo_spark.compare.enum import EnumComparer, compare


def _case_chain_label(comparer, pairs):
    """The legacy CASE-chain formulation, kept as the oracle."""
    out = None
    for i, case in enumerate(comparer.cases):
        cond = case.condition(pairs) if callable(case.condition) else case.condition
        out = F.when(cond, F.lit(i)) if out is None else out.when(cond, F.lit(i))
    if out is None:
        return F.lit(comparer.else_index)
    return out.otherwise(F.lit(comparer.else_index))


def test_label_column_matches_case_chain(spark):
    df = spark.createDataFrame(
        [
            (0.95, 0.95),   # matches both thresholds -> first wins (0)
            (0.8, None),    # matches only the second -> 1
            (0.2, 0.2),     # matches neither -> else (2)
            (None, None),   # NULL conditions skipped -> else (2)
            (float("nan"), float("nan")),  # NaN > any number in Spark -> 0
        ],
        "x double, y double",
    )
    cmp_ = EnumComparer(
        "c",
        [
            ("hi", lambda d: d["x"] >= 0.9),
            ("mid", lambda d: d["x"] >= 0.7),
        ],
    )
    got = [r["c"] for r in df.select(cmp_.label_column(df).alias("c")).collect()]
    want = [r["c"] for r in df.select(_case_chain_label(cmp_, df).alias("c")).collect()]
    assert got == want == [0, 1, 2, 2, 0]


def test_label_column_null_condition_falls_to_else(spark):
    """A NULL condition is 'not matched' (CASE semantics), never an
    error and never level 0."""
    df = spark.createDataFrame([(None,), ("a",)], "s string")
    cmp_ = EnumComparer("c", [("eq", lambda d: d["s"] == "a")])
    got = sorted(
        r["c"] for r in df.select(cmp_.label_column(df).alias("c")).collect()
    )
    assert got == [0, 1]


def test_label_column_no_cases_is_else_literal(spark):
    df = spark.createDataFrame([(1,)], "x int")
    cmp_ = EnumComparer("c", [])
    assert [r["c"] for r in df.select(cmp_.label_column(df).alias("c")).collect()] == [0]


def test_compare_multi_dimension_values(spark):
    df = spark.createDataFrame([(1, 9), (2, 2)], "a int, b int")
    cs = [
        EnumComparer("ca", [("one", lambda d: d["a"] == 1)]),
        EnumComparer("cb", [("big", lambda d: d["b"] >= 5), ("mid", lambda d: d["b"] >= 2)]),
    ]
    rows = {
        (r["a"], r["b"]): (r["ca"], r["cb"])
        for r in compare(df, cs).collect()
    }
    assert rows == {(1, 9): (0, 0), (2, 2): (1, 1)}
