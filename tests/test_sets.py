"""Tversky-family set similarities (mismo_spark/sets/compare.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F




class TestTversky:
    def test_family_identities(self, spark):
        from mismo_spark.sets.compare import (
            containment,
            dice,
            jaccard,
            tversky,
        )

        df = spark.createDataFrame(
            [(["a", "b", "c"], ["b", "c", "d", "e"])],
            "a array<string>, b array<string>",
        )
        row = df.select(
            tversky(F.col("a"), F.col("b"), alpha=1.0, beta=1.0).alias("t11"),
            jaccard(F.col("a"), F.col("b")).alias("jac"),
            dice(F.col("a"), F.col("b")).alias("dice"),
            tversky(F.col("a"), F.col("b"), alpha=1.0, beta=0.0).alias("t10"),
            containment(F.col("a"), F.col("b")).alias("cont"),
        ).first()
        assert row.t11 == pytest.approx(row.jac)  # α=β=1 → Jaccard
        assert row.t10 == pytest.approx(row.cont)  # α=1, β=0 → containment
        assert row.dice == pytest.approx(2 * 2 / (3 + 4))  # 2|∩|/(|a|+|b|)

    def test_empty_and_null(self, spark):
        from mismo_spark.sets.compare import tversky

        df = spark.createDataFrame(
            [([], [], 1), (["x"], None, 2)],
            "a array<string>, b array<string>, i int",
        )
        rows = {r.i: r.t for r in df.select(
            F.col("i"), tversky(F.col("a"), F.col("b")).alias("t")
        ).collect()}
        assert rows[1] == 0.0
        assert rows[2] is None
