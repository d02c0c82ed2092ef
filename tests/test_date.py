"""Date comparer levels: golden cases per level, null handling,
timestamp inputs, within_seconds."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mismo_spark.lib.date import DateMatchLevel, match_level, within_seconds


def test_date_match_levels(spark):
    D = dt.date
    cases = [
        (D(1990, 3, 7), D(1990, 3, 7), DateMatchLevel.EXACT),
        # day/month transposed, same year
        (D(1990, 3, 7), D(1990, 7, 3), DateMatchLevel.SWAPPED_DAY_MONTH),
        # day=month (3/3): a swap is the SAME date -> exact, not swap
        (D(1990, 3, 3), D(1990, 3, 3), DateMatchLevel.EXACT),
        # same month+year, different day
        (D(1990, 3, 7), D(1990, 3, 19), DateMatchLevel.SAME_MONTH_YEAR),
        # within 7 days across a month boundary
        (D(1990, 3, 30), D(1990, 4, 2), DateMatchLevel.WITHIN_N_DAYS),
        # swapped beats same-month-year ordering when both could apply?
        # (3/7 vs 7/3 differ in month, so no overlap) — plain else:
        (D(1990, 3, 7), D(1991, 3, 7), DateMatchLevel.ELSE),
        (None, D(1990, 1, 1), DateMatchLevel.ELSE),
        (None, None, DateMatchLevel.ELSE),
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b, _) in enumerate(cases)],
        "i long, a date, b date",
    )
    got = {
        r["i"]: r["lvl"]
        for r in df.select(
            "i", match_level(F.col("a"), F.col("b")).alias("lvl")
        ).collect()
    }
    for i, (_, _, want) in enumerate(cases):
        assert got[i] == int(want), (i, cases[i])
    # symmetry of the swap level
    got_rev = df.select(
        "i", match_level(F.col("b"), F.col("a")).alias("lvl")
    ).collect()
    assert {r["i"]: r["lvl"] for r in got_rev}[1] == int(
        DateMatchLevel.SWAPPED_DAY_MONTH
    )


def test_date_match_on_timestamps(spark):
    T = dt.datetime
    df = spark.createDataFrame(
        [(T(2024, 5, 1, 23, 59), T(2024, 5, 1, 0, 1))], "a timestamp, b timestamp"
    )
    got = df.select(match_level(F.col("a"), F.col("b")).alias("l")).collect()
    assert got[0]["l"] == int(DateMatchLevel.EXACT)  # same calendar date


def test_within_seconds(spark):
    T = dt.datetime
    df = spark.createDataFrame(
        [
            (T(2024, 5, 1, 12, 0, 0), T(2024, 5, 1, 12, 0, 59)),
            (T(2024, 5, 1, 12, 0, 0), T(2024, 5, 1, 12, 2, 0)),
            (T(2024, 5, 1, 12, 0, 0), None),
        ],
        "a timestamp, b timestamp",
    )
    got = [
        r["w"]
        for r in df.select(
            within_seconds(F.col("a"), F.col("b"), 60).alias("w")
        ).collect()
    ]
    assert got == [True, False, False]
