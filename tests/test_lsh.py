"""Minhash-LSH: determinism + analytic acceptance curve — FIXTURES.md F9
(oracle: p_blocked = 1 − (1 − j^band_size)^n_bands,
mismo/linker/_lsh.py:101-102; structure of the reference's skipped test
mismo/linker/tests/test_lsh.py:23-34)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mismo_spark.linker.lsh import MinhashLshLinker, minhash_lsh_keys, p_blocked


def test_keys_are_deterministic(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["a", "b", "c"]), (3, ["x", "y"])],
        "record_id long, toks array<string>",
    )
    keyed = df.select(
        "record_id",
        minhash_lsh_keys(F.col("toks"), band_size=2, n_bands=4).alias("k"),
    )
    rows = {r["record_id"]: r["k"] for r in keyed.collect()}
    rows2 = {r["record_id"]: r["k"] for r in keyed.collect()}
    assert rows == rows2  # stable across jobs
    assert rows[1] == rows[2]  # identical sets → identical keys
    assert rows[1] != rows[3]
    assert len(rows[1]) == 4


def test_empty_and_null_sets_never_block(spark):
    df = spark.createDataFrame(
        [(1, []), (2, None), (3, ["a"])],
        "record_id long, toks array<string>",
    )
    keyed = df.select(
        minhash_lsh_keys(F.col("toks"), band_size=2, n_bands=2).alias("k")
    ).collect()
    assert keyed[0]["k"] is None
    assert keyed[1]["k"] is None
    assert keyed[2]["k"] is not None


def test_identical_docs_always_blocked(spark):
    df = spark.createDataFrame(
        [(1, ["q", "w", "e", "r"]), (2, ["q", "w", "e", "r"]), (3, ["z", "z2"])],
        "record_id long, toks array<string>",
    )
    lk = MinhashLshLinker("toks", band_size=2, n_bands=4, task="dedupe")(df)
    got = {(r["record_id_l"], r["record_id_r"]) for r in lk.links.collect()}
    assert (1, 2) in got


@pytest.mark.parametrize("jac,band_size,n_bands", [(0.9, 2, 8), (0.3, 4, 8)])
def test_acceptance_curve(spark, jac, band_size, n_bands):
    """Empirical block rate over seeded token-set pairs at known Jaccard
    ≈ analytic p_blocked (rel tol 0.15, looser than the reference's 0.1
    because our n_pairs is smaller for test speed)."""
    rng = random.Random(123)
    n_pairs, set_size = 400, 40
    overlap = int(round(2 * set_size * jac / (1 + jac)))  # |∩| giving target j
    rows = []
    for i in range(n_pairs):
        shared = [f"s{i}_{k}" for k in range(overlap)]
        a = shared + [f"a{i}_{k}" for k in range(set_size - overlap)]
        b = shared + [f"b{i}_{k}" for k in range(set_size - overlap)]
        rows.append((2 * i, a))
        rows.append((2 * i + 1, b))
    df = spark.createDataFrame(rows, "record_id long, toks array<string>")
    lk = MinhashLshLinker("toks", band_size=band_size, n_bands=n_bands, task="dedupe")(df)
    # count only the intended partner pairs (2i, 2i+1)
    hits = lk.links.filter(
        (F.col("record_id_r") - F.col("record_id_l") == 1)
        & (F.col("record_id_l") % 2 == 0)
    ).count()
    expected = p_blocked(jac, band_size=band_size, n_bands=n_bands)
    assert hits / n_pairs == pytest.approx(expected, rel=0.15, abs=0.05)
