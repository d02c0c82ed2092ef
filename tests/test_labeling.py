"""Labeling sampler: determinism, band coverage, caps, edges."""

import pytest

from mismo_spark.fs.labeling import sample_pairs_for_labeling


def _scored(spark):
    rows = [
        (i, i + 1000, (i % 101) / 100.0) for i in range(300)
    ]  # probabilities sweep 0.00..1.00
    return spark.createDataFrame(
        rows, "record_id_l long, record_id_r long, match_probability double"
    )


def test_deterministic_and_capped(spark):
    df = _scored(spark)
    a = sample_pairs_for_labeling(df, n_per_band=5, n_bands=10, seed=7)
    b = sample_pairs_for_labeling(df, n_per_band=5, n_bands=10, seed=7)
    ra = sorted((r["record_id_l"], r["band"], r["rank"]) for r in a.collect())
    rb = sorted((r["record_id_l"], r["band"], r["rank"]) for r in b.collect())
    assert ra == rb
    assert len(ra) == 50  # every band full at this corpus size
    per_band = {}
    for _, band, rank in ra:
        per_band.setdefault(band, []).append(rank)
    assert set(per_band) == set(range(10))
    for ranks in per_band.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_seed_changes_selection(spark):
    df = _scored(spark)
    a = {
        r["record_id_l"]
        for r in sample_pairs_for_labeling(df, n_per_band=3, seed=1).collect()
    }
    b = {
        r["record_id_l"]
        for r in sample_pairs_for_labeling(df, n_per_band=3, seed=2).collect()
    }
    assert a != b


def test_prob_one_in_top_band_and_nulls_dropped(spark):
    df = spark.createDataFrame(
        [(1, 2, 1.0), (3, 4, 0.0), (5, 6, None)],
        "record_id_l long, record_id_r long, match_probability double",
    )
    rows = sample_pairs_for_labeling(df, n_per_band=5, n_bands=4).collect()
    bands = {r["record_id_l"]: r["band"] for r in rows}
    assert bands == {1: 3, 3: 0}


def test_validation(spark):
    df = _scored(spark)
    with pytest.raises(ValueError):
        sample_pairs_for_labeling(df, n_per_band=0)
