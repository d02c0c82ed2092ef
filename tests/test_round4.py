"""Round-4 additions: embedding near-dup, IVF ANN, stateful stream dedup."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from mismo_spark.ann import cosine_topk, embedding_near_duplicates
from mismo_spark.ann.ivf import ivf_assign, ivf_topk, train_centroids
from mismo_spark.streaming.stateful import stateful_dedupe_stream


def _unit_vectors(n: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    v = rng.randn(n, dim)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _vec_df(spark, vecs, start_id=0):
    rows = [(start_id + i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_duplicates_finds_planted_pairs(spark):
    base = _unit_vectors(20, 64, seed=7)
    planted = base[:5] + 0.01 * _unit_vectors(5, 64, seed=8)
    df = _vec_df(spark, base).unionByName(_vec_df(spark, planted, start_id=100))

    out = embedding_near_duplicates(
        df, min_cosine=0.95, dim=64, n_bands=8, band_bits=8, seed=42
    ).collect()
    got = {(r["id_l"], r["id_r"]) for r in out}
    # random 64-dim unit vectors are near-orthogonal: only the planted
    # copies can clear cosine 0.95
    assert got == {(i, 100 + i) for i in range(5)}
    assert all(r["cosine"] > 0.99 for r in out)


def test_embedding_near_duplicates_bucket_cap(spark):
    base = _unit_vectors(10, 64, seed=7)
    planted = base + 1e-4 * _unit_vectors(10, 64, seed=9)
    df = _vec_df(spark, base).unionByName(_vec_df(spark, planted, start_id=100))
    # cap 1 drops every bucket that could produce a pair
    out = embedding_near_duplicates(
        df, min_cosine=0.9, dim=64, seed=42, max_bucket_size=1
    )
    assert out.count() == 0


def test_ivf_recall_vs_brute_force(spark):
    # 8 well-separated clusters of 25 points each
    centers = _unit_vectors(8, 64, seed=1)
    rng = np.random.RandomState(2)
    pts = []
    for c in centers:
        noisy = c + 0.15 * rng.randn(25, 64)
        pts.append(noisy / np.linalg.norm(noisy, axis=1, keepdims=True))
    corpus = _vec_df(spark, np.vstack(pts))
    queries = corpus.filter(F.col("vec_id") % 20 == 3)

    cents = train_centroids(
        corpus, n_lists=8, n_iters=3, sample_size=200, seed=42
    )
    assert cents.shape == (8, 64)
    indexed = ivf_assign(corpus, cents)
    # every corpus row lands in exactly one of the 8 cells
    n_cells = indexed.select("cell").distinct().count()
    assert 1 < n_cells <= 8

    approx = ivf_topk(indexed, queries, cents, k=5, n_probe=2)
    exact = cosine_topk(corpus, queries, k=5)
    a = {(r["query_id"], r["neighbour_id"]) for r in approx.collect()}
    e = {(r["query_id"], r["neighbour_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.8, f"IVF recall {recall:.2f} < 0.8"


def test_stateful_dedupe_stream_cross_batch(spark, tmp_path):
    schema = "id long, fp string"
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_drain():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        deduped = stateful_dedupe_stream(
            stream, key_column="fp", id_column="id"
        )
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    batch1 = spark.createDataFrame([(2, "a"), (1, "a"), (3, "b")], schema)
    batch1.write.mode("append").parquet(in_dir)
    run_drain()
    got1 = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {(1, "a"), (3, "b")}  # min id per fp within the batch

    # batch 2: "a" reappears (must be suppressed by cross-batch state),
    # "c" is new
    batch2 = spark.createDataFrame([(4, "a"), (5, "c")], schema)
    batch2.write.mode("append").parquet(in_dir)
    run_drain()
    got2 = {tuple(r) for r in spark.read.parquet(out_dir).collect()}
    assert got2 == {(1, "a"), (3, "b"), (5, "c")}


def test_or_linker_track_rules_false_same_pairs(spark):
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.linker.or_ import OrLinker

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 10), (4, "b", 20), (5, "c", 10)],
        "record_id long, letter string, num long",
    )
    linkers = {
        "letter": KeyLinker(["letter"], task="dedupe"),
        "num": KeyLinker(["num"], task="dedupe"),
    }
    with_rules = OrLinker(dict(linkers), task="dedupe")(df).links
    bare = OrLinker(dict(linkers), task="dedupe", track_rules=False)(df).links
    assert set(bare.columns) == {"record_id_l", "record_id_r"}
    a = {(r[0], r[1]) for r in with_rules.select("record_id_l", "record_id_r").collect()}
    b = {(r[0], r[1]) for r in bare.collect()}
    assert a == b and len(a) > 0


def test_jaccard_distinct_matches_jaccard(spark):
    from mismo_spark.sets.compare import jaccard, jaccard_distinct
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([1, 2, 3], [2, 3, 4]), ([1], [2]), ([], [1]), ([5, 6], [5, 6])],
        "a array<long>, b array<long>",
    )
    out = df.select(
        jaccard(F.col("a"), F.col("b")).alias("j"),
        jaccard_distinct(F.col("a"), F.col("b")).alias("jd"),
    ).collect()
    for r in out:
        assert r["j"] == r["jd"]


def test_links_with_both_broadcast_equivalent(spark):
    from mismo_spark.types.linkage import Linkage

    recs = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "record_id long, val string"
    )
    links = spark.createDataFrame(
        [(1, 2), (2, 3)], "record_id_l long, record_id_r long"
    )
    plain = Linkage(recs, recs, links).links_with_both()
    bcast = Linkage(recs, recs, links).links_with_both(broadcast_records=True)
    assert set(plain.columns) == set(bcast.columns)
    key = lambda r: (r["record_id_l"], r["record_id_r"])  # noqa: E731
    assert sorted(map(key, plain.collect())) == sorted(map(key, bcast.collect()))
    rows = {key(r): (r["val_l"], r["val_r"]) for r in bcast.collect()}
    assert rows == {(1, 2): ("x", "y"), (2, 3): ("y", "z")}
