"""TF-adjusted Fellegi-Sunter scoring: golden factors, damping,
floors, and the sum-f-squared u consistency check."""

import math

import pytest
from pyspark.sql import functions as F

from mismo_spark.fs.tf_adjust import (
    expected_u_from_frequencies,
    score_compared_tf,
    tf_adjustment_column,
)
from mismo_spark.fs.weights import ComparerWeights, LevelWeights, Weights


def _weights():
    return Weights(
        [
            ComparerWeights(
                "name_cmp",
                [
                    LevelWeights("exact", m=0.8, u=0.02),
                    LevelWeights("else", m=0.2, u=0.98),
                ],
            )
        ]
    )


def _compared(spark):
    # label 0 = exact; freq = agreeing value's relative frequency
    return spark.createDataFrame(
        [
            (1, 2, 0, 0.5),    # "smith": common -> damped odds
            (3, 4, 0, 0.002),  # "zabrinsky": rare -> boosted odds
            (5, 6, 1, None),   # non-exact: untouched
            (7, 8, 0, None),   # exact but unknown freq: untouched
        ],
        "record_id_l long, record_id_r long, name_cmp int, freq double",
    )


def test_adjusted_odds_golden(spark):
    w = _weights()
    out = {
        (r["record_id_l"], r["record_id_r"]): r["odds"]
        for r in score_compared_tf(
            w, _compared(spark), {"name_cmp": "freq"}
        ).collect()
    }
    base_exact = 0.8 / 0.02
    assert out[(1, 2)] == pytest.approx(base_exact * 0.02 / 0.5)   # m/f = 1.6
    assert out[(3, 4)] == pytest.approx(base_exact * 0.02 / 0.002)  # 400
    assert out[(5, 6)] == pytest.approx(0.2 / 0.98)
    assert out[(7, 8)] == pytest.approx(base_exact)


def test_damping_and_floor(spark):
    w = _weights()["name_cmp"]
    df = spark.createDataFrame(
        [(0, 0.5), (0, 1e-12)], "name_cmp int, freq double"
    )
    half = df.select(
        tf_adjustment_column(
            w, F.col("name_cmp"), F.col("freq"), tf_weight=0.5
        ).alias("a")
    ).collect()
    assert half[0]["a"] == pytest.approx(math.sqrt(0.02 / 0.5))
    # the 1e-12 frequency is floored at min_frequency=1e-6
    assert half[1]["a"] == pytest.approx(math.sqrt(0.02 / 1e-6))
    with pytest.raises(ValueError):
        tf_adjustment_column(
            w, F.col("name_cmp"), F.col("freq"), tf_weight=2.0
        )


def test_match_probability_consistent(spark):
    w = _weights()
    rows = score_compared_tf(
        w, _compared(spark), {"name_cmp": "freq"}
    ).collect()
    for r in rows:
        assert r["match_probability"] == pytest.approx(
            r["odds"] / (1 + r["odds"])
        )
        assert r["name_cmp_odds"] == pytest.approx(r["odds"])


def test_expected_u_from_frequencies(spark):
    from mismo_spark.tf import value_stats

    df = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("c",)],
        "v string",
    )
    u = expected_u_from_frequencies(value_stats(df, "v")).collect()[0]["u"]
    assert u == pytest.approx(0.6**2 + 0.3**2 + 0.1**2)


def test_unknown_adjustment_key_raises(spark):
    w = _weights()
    with pytest.raises(ValueError, match="name_comp"):
        score_compared_tf(w, _compared(spark), {"name_comp": "freq"})
