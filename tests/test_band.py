"""BandLinker (numeric band blocking) vs brute-force |Δ| ≤ band."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mismo_spark.linker.band import BandLinker


def brute(rows, band, keys=False):
    out = set()
    for i, (ia, xa, ka) in enumerate(rows):
        for ib, xb, kb in rows[i + 1 :]:
            if xa is None or xb is None:
                continue
            if keys and (ka != kb or ka is None):
                continue
            if abs(xa - xb) <= band:
                out.add((min(ia, ib), max(ia, ib)))
    return sorted(out)


def run_dedupe(spark, rows, band, keys=()):
    df = spark.createDataFrame(rows, "record_id long, x double, k string")
    lk = BandLinker("x", band=band, keys=keys, task="dedupe")(df)
    return sorted(
        (r.record_id_l, r.record_id_r) for r in lk.links.collect()
    )


def test_dedupe_matches_bruteforce_and_no_duplicates(spark):
    rng = random.Random(3)
    rows = [(i, round(rng.uniform(0, 50), 2), "a") for i in range(60)]
    got = run_dedupe(spark, rows, 1.5)
    assert got == brute(rows, 1.5)
    assert len(got) == len(set(got))  # exactly-once generation


def test_boundary_is_inclusive(spark):
    rows = [(1, 10.0, "a"), (2, 12.5, "a"), (3, 12.51, "a")]
    assert run_dedupe(spark, rows, 2.5) == [(1, 2), (2, 3)]


def test_keys_and_nulls(spark):
    rows = [
        (1, 1.0, "a"),
        (2, 1.2, "a"),
        (3, 1.1, "b"),
        (4, None, "a"),
        (5, 1.3, None),
    ]
    got = run_dedupe(spark, rows, 1.0, keys=["k"])
    assert got == brute(rows, 1.0, keys=True) == [(1, 2)]


def test_link_task_cross_table(spark):
    left = spark.createDataFrame(
        [(1, 9.9), (2, 30.0)], "record_id long, x double"
    )
    right = spark.createDataFrame(
        [(10, 10.5), (11, 29.0), (12, 50.0)], "record_id long, x double"
    )
    lk = BandLinker("x", band=1.0, task="link")(left, right)
    got = sorted((r.record_id_l, r.record_id_r) for r in lk.links.collect())
    assert got == [(1, 10), (2, 11)]


def test_negative_values_and_bucket_edges(spark):
    # floor() on negatives: -0.1 and 0.1 are one bucket apart
    rows = [(1, -0.1, "a"), (2, 0.1, "a"), (3, -5.0, "a")]
    assert run_dedupe(spark, rows, 0.5) == [(1, 2)]


def test_bad_band_raises(spark):
    with pytest.raises(ValueError, match="band"):
        BandLinker("x", band=0)
