"""FS probability calibration diagnostics."""

from __future__ import annotations

import math


def test_calibration_curve(spark):
    from mismo_spark.fs.calibration import calibration_curve

    rows = [
        (0.05, False),
        (0.05, False),
        (0.15, False),
        (0.15, True),
        (0.95, True),
        (1.0, True),  # p=1.0 must clamp into the top bin
    ]
    df = spark.createDataFrame(rows, "match_probability double, is_match boolean")
    out = {r["bin"]: r for r in calibration_curve(df, n_bins=10).collect()}
    assert set(out) == {0, 1, 9}
    assert out[0]["n_pairs"] == 2 and out[0]["fraction_matched"] == 0.0
    assert out[1]["n_pairs"] == 2 and abs(out[1]["fraction_matched"] - 0.5) < 1e-12
    assert out[9]["n_pairs"] == 2 and out[9]["fraction_matched"] == 1.0
    assert abs(out[9]["mean_predicted"] - 0.975) < 1e-12
    assert abs(out[1]["p_lo"] - 0.1) < 1e-12 and abs(out[1]["p_hi"] - 0.2) < 1e-12


def test_brier_and_log_loss(spark):
    from mismo_spark.fs.calibration import brier_score, log_loss

    rows = [(0.9, True), (0.1, False), (0.8, False)]
    df = spark.createDataFrame(rows, "match_probability double, is_match boolean")
    want_brier = ((0.9 - 1) ** 2 + (0.1 - 0) ** 2 + (0.8 - 0) ** 2) / 3
    assert abs(brier_score(df) - want_brier) < 1e-12
    want_ll = -(math.log(0.9) + math.log(0.9) + math.log(0.2)) / 3
    assert abs(log_loss(df) - want_ll) < 1e-12

    # perfect confident predictions: eps clamp keeps log finite
    df2 = spark.createDataFrame(
        [(1.0, True), (0.0, False)], "match_probability double, is_match boolean"
    )
    assert log_loss(df2) < 1e-12
