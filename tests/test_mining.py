import math

import pytest
from pyspark.sql import functions as F

from mismo_spark.ann.mining import contrastive_triplets


def _unit(*xs):
    n = math.sqrt(sum(x * x for x in xs))
    return [x / n for x in xs]


@pytest.fixture(scope="module")
def corpus(spark):
    # 4-dim toy corpus: two tight clusters + one outlier
    rows = [
        (1, _unit(1.0, 0.02, 0.0, 0.0)),
        (2, _unit(1.0, 0.0, 0.02, 0.0)),   # dup of 1 (planted)
        (3, _unit(0.98, 0.05, 0.05, 0.0)),  # near 1/2 but NOT a dup
        (4, _unit(0.0, 1.0, 0.02, 0.0)),
        (5, _unit(0.0, 1.0, 0.0, 0.02)),   # dup of 4
        (6, _unit(0.05, 0.98, 0.05, 0.0)),  # near 4/5, not a dup
        (7, _unit(0.0, 0.0, 0.0, 1.0)),    # outlier: no dup, far bucket
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _dup(spark):
    return spark.createDataFrame([(1, 2), (4, 5)], "id_l long, id_r long")


def test_triplets_pick_dup_positive_and_nondup_negative(spark, corpus):
    out = {
        r["anchor_id"]: r
        for r in contrastive_triplets(
            corpus, _dup(spark), dim=4, n_bands=4, band_bits=2, seed=7
        ).collect()
    }
    # anchors are exactly the duplicate endpoints that also have a
    # same-bucket non-dup neighbour
    for a in out:
        assert a in {1, 2, 4, 5}
    if 1 in out:
        assert out[1]["positive_id"] == 2
        assert out[1]["negative_id"] not in (1, 2)
        assert out[1]["pos_cosine"] > 0.99
        # hard negative is genuinely hard: closer than random
        assert out[1]["neg_cosine"] > 0.5
    if 4 in out:
        assert out[4]["positive_id"] == 5
        assert out[4]["negative_id"] not in (4, 5)
    # the negative must never be a duplicate partner of its anchor
    for a, r in out.items():
        assert {a, r["negative_id"]} not in ({1, 2}, {4, 5})


def test_triplets_brute_force_parity(spark, corpus):
    # every emitted (positive, negative) matches the brute-force argmax
    # restricted to the operator's own bucket-candidate set
    import itertools

    vecs = {r["vec_id"]: r["embedding"] for r in corpus.collect()}
    dup = {(1, 2), (2, 1), (4, 5), (5, 4)}

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        d = sum(x * y for x, y in zip(va, vb))
        return d / (
            math.sqrt(sum(x * x for x in va)) * math.sqrt(sum(x * x for x in vb))
        )

    out = contrastive_triplets(
        corpus, _dup(spark), dim=4, n_bands=4, band_bits=2, seed=7
    ).collect()
    for r in out:
        a = r["anchor_id"]
        # positive: best dup partner
        parts = [p for (x, p) in dup if x == a]
        best_pos = max(parts, key=lambda p: (cos(a, p), -p))
        assert r["positive_id"] == best_pos
        assert r["pos_cosine"] == pytest.approx(cos(a, best_pos), abs=1e-9)
        # negative: at least as good as any OTHER emitted candidate
        # would be, and never a dup/self
        assert (a, r["negative_id"]) not in dup and r["negative_id"] != a
        assert r["neg_cosine"] == pytest.approx(cos(a, r["negative_id"]), abs=1e-9)


def test_triplets_anchor_without_negative_drops(spark):
    # two isolated dup vectors orthogonal to everything: their bucket
    # holds only each other, so no non-dup candidate exists -> no row
    rows = [
        (1, _unit(1.0, 0.0, 0.0, 0.0)),
        (2, _unit(1.0, 0.001, 0.0, 0.0)),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    dup = spark.createDataFrame([(1, 2)], "id_l long, id_r long")
    assert (
        contrastive_triplets(emb, dup, dim=4, n_bands=2, band_bits=2, seed=7).count()
        == 0
    )


def test_degenerate_vectors_never_win(spark):
    # a zero-norm vector shares every bucket region yet must never be
    # chosen as positive or negative (NULL cosine is dropped, not won)
    rows = [
        (1, _unit(1.0, 0.02, 0.0, 0.0)),
        (2, _unit(1.0, 0.0, 0.02, 0.0)),
        (3, _unit(0.98, 0.05, 0.05, 0.0)),
        (9, [0.0, 0.0, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    dup = spark.createDataFrame([(1, 2)], "id_l long, id_r long")
    out = contrastive_triplets(emb, dup, dim=4, n_bands=4, band_bits=2, seed=7)
    for r in out.collect():
        assert r["negative_id"] != 9 and r["positive_id"] != 9
        assert r["neg_cosine"] is not None and r["pos_cosine"] is not None


def test_dim_inference_errors(spark):
    import pytest as _pytest

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    dup = spark.createDataFrame([(1, 2)], "id_l long, id_r long")
    with _pytest.raises(ValueError, match="cannot infer dim"):
        contrastive_triplets(empty, dup)
