"""Cluster centroids + embedding outlier scores."""

import pytest

from mismo_spark.cluster.centroid import cluster_centroids, embedding_outliers


def _assign(spark):
    return spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (9, 9), (10, 10)],
        "record_id long, component long",
    )


def _emb(spark):
    return spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [1.0, 0.2]),
            (3, [0.0, 1.0]),   # the impostor in component 1
            (9, [0.5, 0.5]),   # singleton component: excluded
            # record 10 has no embedding row at all
        ],
        "record_id long, embedding array<double>",
    )


def test_centroid_values(spark):
    rows = cluster_centroids(_assign(spark), _emb(spark)).collect()
    assert len(rows) == 1  # only component 1 has >= 2 embedded members
    r = rows[0]
    assert r["component"] == 1 and r["n_members"] == 3
    assert r["centroid"][0] == pytest.approx(2.0 / 3)
    assert r["centroid"][1] == pytest.approx(0.4)


def test_outlier_ordering(spark):
    rows = embedding_outliers(_assign(spark), _emb(spark)).collect()
    scores = {r["record_id"]: r["cosine_to_centroid"] for r in rows}
    assert set(scores) == {1, 2, 3}
    # the orthogonal-ish member scores lowest
    assert scores[3] < scores[1] and scores[3] < scores[2]
    for rid, c in scores.items():
        import math

        v = {1: [1.0, 0.0], 2: [1.0, 0.2], 3: [0.0, 1.0]}[rid]
        cent = [2.0 / 3, 0.4]
        dot = sum(a * b for a, b in zip(v, cent))
        want = dot / (
            math.sqrt(sum(a * a for a in v))
            * math.sqrt(sum(a * a for a in cent))
        )
        assert c == pytest.approx(want, abs=1e-12)
