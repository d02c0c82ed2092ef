"""FS training directionality on an RLdata-shaped corpus — FIXTURES.md F6
(mismo/fs/tests/test_train.py:103-157: direction, not exact values)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mismo_spark import EnumComparer, train_using_em, train_using_labels
from mismo_spark.fs.train import level_proportions, sample_all_links
from mismo_spark.compare.enum import compare


FNAMES = ["anna", "bert", "carl", "dora", "emil", "frida", "gerd", "hugo"]
LNAMES = ["meier", "schmidt", "koch", "wolf", "braun", "vogel"]


@pytest.fixture(scope="module")
def persons(spark):
    """~500 records, ~10% noisy duplicates (contract of
    mismo/playdata.py:184-192)."""
    rng = random.Random(99)
    rows = []
    rid = 0
    for ent in range(450):
        fn = rng.choice(FNAMES)
        ln = rng.choice(LNAMES)
        by = rng.randint(1940, 2000)
        bm = rng.randint(1, 12)
        bd = rng.randint(1, 28)
        rows.append((rid, ent, fn, ln, by, bm, bd))
        rid += 1
        if rng.random() < 0.11:  # duplicate with noise
            fn2 = fn if rng.random() < 0.7 else fn[:-1] + "x"
            by2 = by if rng.random() < 0.8 else by + 1
            rows.append((rid, ent, fn2, ln, by2, bm, bd))
            rid += 1
    return spark.createDataFrame(
        rows,
        "record_id long, label_true long, fname string, lname string, "
        "by long, bm long, bd long",
    ).cache()


def comparers():
    return [
        EnumComparer("fname_cmp", [("exact", lambda df: df["fname_l"] == df["fname_r"])]),
        EnumComparer("by_cmp", [("exact", lambda df: df["by_l"] == df["by_r"])]),
    ]


def test_train_using_labels_direction(persons):
    w = train_using_labels(comparers(), persons, persons, max_pairs=50_000)
    fn = w["fname_cmp"]
    # among true matches, exact first-name agreement is far likelier
    assert fn["exact"].m > 0.5
    assert fn["exact"].m > fn["exact"].u * 3
    assert fn["exact"].odds > 1.0


def test_train_using_em_direction(persons):
    cmps = comparers() + [
        EnumComparer("lname_cmp", [("exact", lambda df: df["lname_l"] == df["lname_r"])]),
        EnumComparer("bm_cmp", [("exact", lambda df: df["bm_l"] == df["bm_r"])]),
        EnumComparer("bd_cmp", [("exact", lambda df: df["bd_l"] == df["bd_r"])]),
    ]
    w = train_using_em(cmps, persons, persons, max_pairs=250_000)
    # EM should find that exact agreement indicates a match (direction,
    # not exact values — mismo/fs/tests/test_train.py:122-157)
    assert w["lname_cmp"]["exact"].odds > 1.0
    assert w["bd_cmp"]["exact"].odds > 1.0
    assert w["lname_cmp"]["else"].odds < 1.0


def test_level_proportions_smoothing(spark):
    cmp = EnumComparer("c", [("exact", lambda df: df["x_l"] == df["x_r"])])
    labels = spark.createDataFrame([(0,), (0,), (0,)], f"{cmp.name} long")
    props = level_proportions(labels, cmp)
    # unseen 'else' level smoothed to 1 pseudo-count: [3/4, 1/4]
    assert props == pytest.approx([0.75, 0.25])


def test_sample_all_links_bounded_and_deterministic(persons):
    s1 = sample_all_links(persons, persons, max_pairs=500, seed=7)
    s2 = sample_all_links(persons, persons, max_pairs=500, seed=7)
    assert s1.count() <= 500
    assert s1.count() > 100
    assert s1.exceptAll(s2).count() == 0


def test_em_from_sample_matches_per_iteration_jobs(spark):
    """The driver-side joint-histogram EM must be bit-identical to the
    original formulation that re-scored the sample on the cluster each
    iteration (the old loop is inlined here as the oracle)."""
    from mismo_spark.compare.enum import EnumComparer
    from mismo_spark.fs.em import (
        EM_ITERATIONS,
        MATCH_ODDS_THRESHOLD,
        _initial_weights,
        _weights_from_histogram,
        em_from_sample,
    )

    cmps = [
        EnumComparer("a_cmp", [("exact", lambda df: df["a"] == 0)]),
        EnumComparer("b_cmp", [("exact", lambda df: df["b"] == 0)]),
    ]
    rows = [(i % 3, (i * 7) % 5) for i in range(200)]
    pairs = spark.createDataFrame(rows, "a long, b long")
    from mismo_spark.compare.enum import compare

    compared = compare(pairs, cmps).select("a_cmp", "b_cmp")

    # oracle: the per-iteration cluster formulation
    dims = ["a_cmp", "b_cmp"]
    w_old = _initial_weights(cmps, compared)
    for _ in range(EM_ITERATIONS):
        scored = w_old.score_compared(compared)
        hist = (
            scored.withColumn("__is_match", F.col("odds") >= MATCH_ODDS_THRESHOLD)
            .groupBy("__is_match", *dims)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        w_old = _weights_from_histogram(cmps, hist)

    w_new = em_from_sample(cmps, compared)
    for c in cmps:
        for lev in range(len(c.level_names)):
            assert w_new[c.name][lev].m == w_old[c.name][lev].m
            assert w_new[c.name][lev].u == w_old[c.name][lev].u
