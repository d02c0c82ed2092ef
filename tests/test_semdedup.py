"""SemDeDup (Abbas et al. 2023): centroid-cell semantic dedup.

Covers: seed-centroid determinism, within-cell-only candidate pairs,
both keep rules (the paper's low-centroid-sim default and the
high-centroid-sim variant), exactly-one-keeper-per-group, singleton
passthrough, null vectors, and equality with a brute-force
numpy/union-find reference on random data.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mismo_spark.ann.semdedup import (
    assign_cells,
    seed_centroids,
    semantic_dup_pairs,
    semdedup,
)


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture
def two_groups(spark):
    """Two tight direction-groups plus a lone vector.

    ids 0..2 point near +x (group A), ids 3..5 near +y (group B),
    id 6 along -x-y (alone).  Seed centroids (k=2) are ids 0 and 1 —
    both in A's direction — so cells split A∪{6-ish} from nothing...
    to keep geometry honest we use k=2 with ids 0 (x-ish) and 3 (y-ish)
    by reordering: the two lowest ids are one from each group.
    """
    rows = [
        (0, [1.0, 0.02, 0.0]),
        (1, [0.0, 1.0, 0.03]),
        (2, [1.0, 0.05, 0.0]),
        (3, [0.98, 0.0, 0.01]),
        (4, [0.02, 1.0, 0.0]),
        (5, [0.0, 0.97, 0.05]),
        (6, [-1.0, -1.0, 0.0]),
    ]
    return _emb_df(spark, rows)


def test_seed_centroids_lowest_ids(spark, two_groups):
    c = seed_centroids(two_groups, 2)
    assert c.shape == (2, 3)
    np.testing.assert_allclose(c[0], [1.0, 0.02, 0.0])
    np.testing.assert_allclose(c[1], [0.0, 1.0, 0.03])


def test_seed_centroids_too_few(spark):
    df = _emb_df(spark, [(0, [1.0, 0.0])])
    with pytest.raises(ValueError, match="at least 3"):
        seed_centroids(df, 3)


def test_assign_cells(spark, two_groups):
    c = seed_centroids(two_groups, 2)
    got = {
        r["vec_id"]: (r["cell"], r["cent_cos"])
        for r in assign_cells(two_groups, c).collect()
    }
    # x-direction vectors → cell 0, y-direction → cell 1; the
    # anti-aligned outlier 6 argmaxes to cell 1 (−0.7068 > −0.7211)
    assert {i: got[i][0] for i in range(7)} == {
        0: 0, 1: 1, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1
    }
    assert got[0][1] == pytest.approx(1.0)
    assert got[6][1] < 0  # anti-aligned outlier


def test_pairs_within_cell_only(spark, two_groups):
    c = seed_centroids(two_groups, 2)
    pairs = semantic_dup_pairs(two_groups, c, min_cosine=0.95)
    got = {(r["id_l"], r["id_r"]) for r in pairs.collect()}
    # cell 0 = {0, 2, 3}: all three pairwise near-dups
    # cell 1 = {1, 4, 5, 6}: 1~4, 1~5, 4~5 are near-dups, 6 matches none
    assert got == {(0, 2), (0, 3), (2, 3), (1, 4), (1, 5), (4, 5)}
    for r in pairs.collect():
        assert r["cosine"] >= 0.95


def test_max_cell_size_guard(spark, two_groups):
    c = seed_centroids(two_groups, 2)
    pairs = semantic_dup_pairs(two_groups, c, min_cosine=0.95, max_cell_size=3)
    got = {(r["id_l"], r["id_r"]) for r in pairs.collect()}
    # cell 1 has 4 members (incl. the outlier 6) → dropped; cell 0 stays
    assert got == {(0, 2), (0, 3), (2, 3)}


def test_semdedup_keep_rules(spark, two_groups):
    c = seed_centroids(two_groups, 2)
    out = semdedup(two_groups, c, min_cosine=0.95)
    rows = {r["vec_id"]: r for r in out.collect()}
    assert len(rows) == 7
    # groups: {0,2,3} (cell 0), {1,4,5} (cell 1), {6} singleton
    assert rows[0]["component"] == rows[2]["component"] == rows[3]["component"]
    assert rows[1]["component"] == rows[4]["component"] == rows[5]["component"]
    assert rows[6]["keep"] is True  # singleton survives
    # exactly one keeper per component
    kept = [r for r in rows.values() if r["keep"]]
    assert len(kept) == 3
    # paper rule: LOWEST centroid cosine survives.  In group A the
    # centroid IS vector 0, so the keeper is the member least like it;
    # verify against the computed cent_cos ordering rather than
    # hand-derived geometry.
    for comp in {r["component"] for r in rows.values()}:
        members = [r for r in rows.values() if r["component"] == comp]
        best = min(members, key=lambda r: (r["cent_cos"], r["vec_id"]))
        assert best["keep"] is True

    out_hi = semdedup(two_groups, c, min_cosine=0.95, keep="high_centroid_sim")
    rows_hi = {r["vec_id"]: r for r in out_hi.collect()}
    for comp in {r["component"] for r in rows_hi.values()}:
        members = [r for r in rows_hi.values() if r["component"] == comp]
        best = max(members, key=lambda r: (r["cent_cos"], -r["vec_id"]))
        assert best["keep"] is True


def test_semdedup_invalid_keep(spark, two_groups):
    c = seed_centroids(two_groups, 2)
    with pytest.raises(ValueError, match="keep must be"):
        semdedup(two_groups, c, keep="first")


def test_semdedup_matches_bruteforce(spark):
    """Random corpus: Spark output == numpy + union-find reference."""
    rng = np.random.RandomState(7)
    base = rng.randn(6, 8)
    vecs = []
    for i in range(40):
        b = base[i % 6]
        vecs.append(b + 0.02 * rng.randn(8))
    V = np.stack(vecs)
    df = _emb_df(spark, [(i, v) for i, v in enumerate(V)])
    k, thr = 3, 0.9
    C = V[:k].copy()

    # ---- reference ----
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    cos = Vn @ Cn.T
    cell = np.argmax(cos, axis=1)
    cent_cos = cos[np.arange(len(V)), cell]
    parent = list(range(len(V)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    exp_pairs = set()
    for i in range(len(V)):
        for j in range(i + 1, len(V)):
            if cell[i] == cell[j] and float(Vn[i] @ Vn[j]) >= thr:
                exp_pairs.add((i, j))
                parent[find(i)] = find(j)
    comp = {}
    for i in range(len(V)):
        comp.setdefault(find(i), []).append(i)
    exp_keep = set()
    for members in comp.values():
        exp_keep.add(min(members, key=lambda i: (cent_cos[i], i)))

    # ---- Spark ----
    pairs = semantic_dup_pairs(df, C, min_cosine=thr)
    got_pairs = {(r["id_l"], r["id_r"]) for r in pairs.collect()}
    assert got_pairs == exp_pairs
    out = semdedup(df, C, min_cosine=thr)
    got_keep = {r["vec_id"] for r in out.collect() if r["keep"]}
    assert got_keep == exp_keep
    # kept count == number of duplicate groups
    assert len(got_keep) == len(comp)


def test_semdedup_null_and_zero_vectors(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, None), (3, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    c = seed_centroids(df, 1)
    out = {r["vec_id"]: r for r in semdedup(df, c, min_cosine=0.99).collect()}
    assert len(out) == 4
    # null AND zero-norm vectors: cell NULL, cent_cos NULL (never NaN —
    # the cosine_pairs convention), singleton keep=True
    for vid in (2, 3):
        assert out[vid]["cell"] is None
        assert out[vid]["cent_cos"] is None
        assert out[vid]["keep"] is True
    assert {out[0]["keep"], out[1]["keep"]} == {True, False}
