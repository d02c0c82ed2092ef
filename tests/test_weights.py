"""FS weight algebra + JSON round-trip + scoring
(mismo/fs/tests/test_weights.py:10-167, FIXTURES.md F5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mismo_spark import ComparerWeights, EnumComparer, LevelWeights, Weights


def test_level_weights_odds():
    lw = LevelWeights("close", m=0.5, u=0.05)
    assert lw.odds == pytest.approx(10.0)
    assert lw.log_odds == pytest.approx(1.0)


def test_zero_m():
    lw = LevelWeights("x", m=0.0, u=0.6)
    assert lw.odds == 0.0
    assert lw.log_odds == -math.inf


def test_zero_u():
    lw = LevelWeights("x", m=0.5, u=0.0)
    assert lw.odds == math.inf


def test_comparer_weights_lookup():
    cw = ComparerWeights(
        "address",
        [LevelWeights("close", m=0.1, u=0.01), LevelWeights("exact", m=0.6, u=0.3)],
    )
    assert cw.odds("close") == pytest.approx(10.0)
    assert cw.odds("exact") == pytest.approx(2.0)
    assert cw[0].name == "close"
    assert cw["exact"].m == 0.6


def test_json_round_trip():
    w = Weights(
        [
            ComparerWeights(
                "name",
                [
                    LevelWeights("exact", m=0.8, u=0.01),
                    LevelWeights("else", m=0.2, u=0.99),
                ],
            )
        ]
    )
    w2 = Weights.from_json(w.to_json())
    assert w2.to_dict() == w.to_dict()
    assert w2["name"].odds("exact") == pytest.approx(80.0)


def test_score_compared(spark):
    pairs = spark.createDataFrame(
        [(1, 2, 0, 0), (1, 3, 1, 0), (1, 4, 1, 1)],
        "record_id_l long, record_id_r long, name long, addr long",
    )
    w = Weights(
        [
            ComparerWeights(
                "name",
                [LevelWeights("exact", m=0.8, u=0.01), LevelWeights("else", m=0.2, u=0.99)],
            ),
            ComparerWeights(
                "addr",
                [LevelWeights("exact", m=0.5, u=0.05), LevelWeights("else", m=0.5, u=0.95)],
            ),
        ]
    )
    out = {
        (r["record_id_l"], r["record_id_r"]): (
            r["odds"],
            r["match_probability"],
        )
        for r in w.score_compared(pairs).collect()
    }
    # pair (1,2): name exact (80) * addr exact (10) = 800
    assert out[(1, 2)][0] == pytest.approx(800.0)
    assert out[(1, 2)][1] == pytest.approx(800 / 801)
    # pair (1,3): name else (0.202...) * addr exact (10)
    assert out[(1, 3)][0] == pytest.approx((0.2 / 0.99) * 10.0)
    # pair (1,4): both else
    assert out[(1, 4)][0] == pytest.approx((0.2 / 0.99) * (0.5 / 0.95))


def test_unknown_label_scores_nan(spark):
    pairs = spark.createDataFrame([(1, 2, 7)], "record_id_l long, record_id_r long, name long")
    w = Weights(
        [ComparerWeights("name", [LevelWeights("exact", m=0.8, u=0.01), LevelWeights("else", m=0.2, u=0.99)])]
    )
    row = w.score_compared(pairs).collect()[0]
    assert math.isnan(row["name_odds"])


def test_enum_comparer_labels(spark):
    pairs = spark.createDataFrame(
        [(1, 2, "bob", "bob"), (3, 4, "bob", "bub"), (5, 6, "bob", "sue")],
        "record_id_l long, record_id_r long, name_l string, name_r string",
    )
    cmp = EnumComparer(
        "name",
        [
            ("exact", lambda df: df["name_l"] == df["name_r"]),
            (
                "close",
                lambda df: F.levenshtein(df["name_l"], df["name_r"]) <= 1,
            ),
        ],
    )
    got = {(r["record_id_l"], r["name"]) for r in cmp(pairs).collect()}
    assert got == {(1, 0), (3, 1), (5, 2)}
    assert cmp.level_names == ["exact", "close", "else"]


def test_score_waterfall(spark):
    import math

    import pytest
    from pyspark.sql import functions as F

    from mismo_spark.fs.weights import (
        ComparerWeights,
        LevelWeights,
        Weights,
        score_waterfall,
    )

    w = Weights(
        [
            ComparerWeights(
                "a_cmp",
                [LevelWeights("exact", m=0.8, u=0.1), LevelWeights("else", m=0.2, u=0.9)],
            ),
            ComparerWeights(
                "b_cmp",
                [LevelWeights("exact", m=0.5, u=0.25), LevelWeights("else", m=0.5, u=0.75)],
            ),
        ]
    )
    compared = spark.createDataFrame(
        [(1, 2, 0, 1)], "record_id_l long, record_id_r long, a_cmp int, b_cmp int"
    )
    scored = w.score_compared(compared)
    rows = {r["dimension"]: r for r in score_waterfall(scored, w).collect()}
    assert set(rows) == {"a_cmp", "b_cmp", "total"}
    assert rows["a_cmp"]["odds"] == pytest.approx(8.0)
    assert rows["b_cmp"]["odds"] == pytest.approx(0.5 / 0.75)
    assert rows["total"]["odds"] == pytest.approx(8.0 * 0.5 / 0.75)
    # the waterfall property: per-dimension log2 contributions sum to total
    assert rows["a_cmp"]["log2_bf"] + rows["b_cmp"]["log2_bf"] == pytest.approx(
        rows["total"]["log2_bf"]
    )
    assert rows["total"]["level"] is None and rows["a_cmp"]["level"] == 0
