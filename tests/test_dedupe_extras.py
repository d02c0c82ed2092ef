"""Training-data-pipeline extras: exact dedup, minhash/simhash near-dup,
ngram jaccard, textqa, ANN, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mismo_spark.ann import cosine_topk, lsh_cosine_topk
from mismo_spark.dedupe import (
    exact_dedupe_keep_first,
    exact_duplicates,
    hamming64,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_duplicates,
)
from mismo_spark.multimodal import frame_sample_plan, image_features
from mismo_spark.textqa import (
    bpe_ish_token_count,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)


@pytest.fixture
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "The  quick brown fox jumps over the lazy dog"),  # ws+case
            (3, "the quick brown fox leaps over the lazy dog"),  # near-dup
            (4, "completely different text about spark engines"),
            (5, "el rápido zorro marrón salta sobre el perro"),
        ],
        "record_id long, text string",
    )


def test_exact_duplicates(docs):
    groups = exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["record_ids"] == [1, 2]


def test_exact_dedupe_keep_first(docs):
    kept = {r["record_id"] for r in exact_dedupe_keep_first(docs).collect()}
    assert kept == {1, 3, 4, 5}


def test_minhash_near_duplicates(docs):
    pairs = minhash_near_duplicates(
        docs, shingle_size=2, band_size=2, n_bands=16, min_jaccard=0.5
    )
    got = {(r["record_id_l"], r["record_id_r"]) for r in pairs.collect()}
    assert (1, 3) in got or (2, 3) in got  # near-dup found
    assert all(p[0] != 4 and p[1] != 4 for p in got)  # unrelated doc untouched


def test_simhash_and_hamming(spark, docs):
    sh = docs.select("record_id", simhash(F.col("text")).alias("sh"))
    vals = {r["record_id"]: r["sh"] for r in sh.collect()}
    assert vals[1] == vals[2]  # same token set after lower/normalize
    pairs = (
        sh.alias("a")
        .crossJoin(sh.alias("b"))
        .select(hamming64(F.col("a.sh"), F.col("b.sh")).alias("h"))
    )
    assert pairs.filter(F.col("h") < 0).count() == 0


def test_simhash_near_duplicates(docs):
    # the block-permutation join GUARANTEES recall only for
    # hamming ≤ n_blocks − 1 (pigeonhole); exact dups are always found
    out = simhash_near_duplicates(docs, max_hamming=3, n_blocks=4)
    got = {(r["record_id_l"], r["record_id_r"]): r["hamming"] for r in out.collect()}
    assert got[(1, 2)] == 0
    assert all(h <= 3 for h in got.values())


def test_ngram_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, "abcdef", "g"), (2, "abcdxf", "g"), (3, "zzzzzz", "g")],
        "record_id long, text string, grp string",
    )
    pairs = ngram_jaccard_pairs(df, n=3, blocking_key="grp", min_jaccard=0.2)
    got = {(r["record_id_l"], r["record_id_r"]) for r in pairs.collect()}
    assert got == {(1, 2)}


def test_ngram_jaccard_pairs_unblocked_uses_prefix_filter(spark):
    """No blocking key: same pairs as the (single-block) equi-join path,
    but via the exact prefix-filter join — never a cartesian product."""
    df = spark.createDataFrame(
        [(1, "abcdef", "g"), (2, "abcdxf", "g"), (3, "zzzzzz", "g")],
        "record_id long, text string, grp string",
    )
    unblocked = ngram_jaccard_pairs(df, n=3, min_jaccard=0.2)
    plan = unblocked._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    got = {
        (r["record_id_l"], r["record_id_r"]): r["jaccard_sim"]
        for r in unblocked.collect()
    }
    blocked = {
        (r["record_id_l"], r["record_id_r"]): r["jaccard_sim"]
        for r in ngram_jaccard_pairs(
            df, n=3, blocking_key="grp", min_jaccard=0.2
        ).collect()
    }
    assert got == blocked


def test_textqa_functions(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog sat in the house for a while",),
            ("el perro y el gato en la casa por una hora",),
            ("!!!! ???? ....",),
        ],
        "text string",
    )
    out = df.select(
        token_count(F.col("text")).alias("tc"),
        bpe_ish_token_count(F.col("text")).alias("bc"),
        quality_score(F.col("text")).alias("q"),
        lang_id(F.col("text")).alias("lang"),
        fingerprint(F.col("text")).alias("fp"),
    ).collect()
    assert out[0]["tc"] == 12
    assert out[0]["bc"] >= out[0]["tc"]
    assert out[0]["lang"] == "en"
    assert out[1]["lang"] == "es"
    assert out[0]["q"] > out[2]["q"]
    assert isinstance(out[0]["fp"], int)


def test_cosine_topk_exact_vs_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    vecs = rng.randn(30, 8).astype(float)
    df = spark.createDataFrame(
        [(i, vecs[i].tolist()) for i in range(30)], "vec_id long, embedding array<double>"
    )
    got = cosine_topk(df, df.filter(F.col("vec_id") < 3), k=5)
    rows = {(r["query_id"], r["neighbour_id"]): r["cosine"] for r in got.collect()}
    # numpy oracle
    norms = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = norms @ norms.T
    for q in range(3):
        order = [i for i in np.argsort(-sims[q]) if i != q][:5]
        for n in order:
            assert rows[(q, n)] == pytest.approx(sims[q, n], abs=1e-9)
        assert len([k for k in rows if k[0] == q]) == 5


def test_lsh_cosine_topk_recall(spark):
    import numpy as np

    rng = np.random.RandomState(6)
    base = rng.randn(50, 16)
    # plant near-identical neighbours
    corpus = np.vstack([base, base + rng.randn(50, 16) * 0.01])
    df = spark.createDataFrame(
        [(i, corpus[i].tolist()) for i in range(100)], "vec_id long, embedding array<double>"
    )
    got = lsh_cosine_topk(df, df.filter(F.col("vec_id") < 10), k=1, n_bands=16, band_bits=4)
    top1 = {r["query_id"]: r["neighbour_id"] for r in got.collect()}
    hits = sum(1 for q in range(10) if top1.get(q) == q + 50)
    assert hits >= 8  # LSH recall on planted twins


def test_image_features_plumbing(spark):
    df = spark.createDataFrame(
        [("a", bytearray(b"fakejpegbytes-1")), ("b", bytearray(b"fakejpegbytes-2")), ("c", None)],
        "record_id string, payload binary",
    )
    out = image_features(df, feature_dim=4).collect()
    by_id = {r["record_id"]: r for r in out}
    assert by_id["a"]["n_bytes"] == 15
    assert len(by_id["a"]["features"]) == 4
    assert by_id["c"]["features"] is None
    # deterministic
    out2 = image_features(df, feature_dim=4).collect()
    assert {r["record_id"]: r["features"] for r in out2} == {
        r["record_id"]: r["features"] for r in out
    }
    with pytest.raises(NotImplementedError):
        image_features(df, use_fake_decoder=False)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 3.5), (2, 0.5)], "record_id long, duration_s double")
    out = frame_sample_plan(df, every_n_seconds=1.0).collect()
    frames = {}
    for r in out:
        frames.setdefault(r["record_id"], []).append(r["frame_ts"])
    assert sorted(frames[1]) == [0.0, 1.0, 2.0]
    assert frames[2] == [0.0]


def test_minhash_signature_and_estimate(spark):
    import pytest
    from pyspark.sql import functions as F

    from mismo_spark.dedupe import estimated_jaccard, minhash_signature

    df = spark.createDataFrame(
        [
            (["a", "b", "c", "d"], ["a", "b", "c", "d"]),  # identical
            (["a", "b", "c", "d"], ["w", "x", "y", "z"]),  # disjoint
            ([], ["a"]),                                    # empty -> NULL
        ],
        "s array<string>, t array<string>",
    )
    out = df.select(
        estimated_jaccard(
            minhash_signature(F.col("s"), n_hashes=64),
            minhash_signature(F.col("t"), n_hashes=64),
        ).alias("est")
    ).collect()
    assert out[0]["est"] == pytest.approx(1.0)
    assert out[1]["est"] < 0.2  # disjoint sets rarely share minima
    assert out[2]["est"] is None
    with pytest.raises(ValueError):
        minhash_signature(F.col("s"), n_hashes=0)


def test_minhash_near_duplicates_estimate_matches_exact(spark):
    import pytest
    from pyspark.sql import functions as F

    from mismo_spark.dedupe import minhash_near_duplicates

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [(i, base + f" tail{i % 3}") for i in range(12)] + [
        (100 + i, f"completely different document number {i} about trains") for i in range(6)
    ]
    docs = spark.createDataFrame(rows, "record_id long, text string")
    kw = dict(shingle_size=2, band_size=2, n_bands=16, min_jaccard=0.5, seed=7)
    exact = {
        (r["record_id_l"], r["record_id_r"]): r["jaccard_sim"]
        for r in minhash_near_duplicates(docs, **kw).collect()
    }
    est = {
        (r["record_id_l"], r["record_id_r"]): r["jaccard_est"]
        for r in minhash_near_duplicates(docs, verify="estimate", **kw).collect()
    }
    assert exact, "planted near-dups must be found"
    # identical-text pairs (same tail group) are certain in BOTH paths;
    # borderline pairs near the threshold may flip under sketch noise
    planted = {
        (l, r)
        for l in range(12)
        for r in range(l + 1, 12)
        if l % 3 == r % 3
    }
    assert planted <= set(exact) and planted <= set(est)
    for k in planted:
        assert est[k] == pytest.approx(1.0)
    # on the common pairs the estimate sits within sketch tolerance
    for k in set(est) & set(exact):
        assert est[k] == pytest.approx(exact[k], abs=0.35)
    with pytest.raises(ValueError):
        minhash_near_duplicates(docs, verify="nope", **kw)


def test_estimated_jaccard_empty_sketch_is_null(spark):
    from pyspark.sql import functions as F

    from mismo_spark.dedupe import estimated_jaccard

    df = spark.createDataFrame([(1,)], "x int")
    row = df.select(
        estimated_jaccard(
            F.array().cast("array<string>"), F.array().cast("array<string>")
        ).alias("e")
    ).collect()[0]
    assert row["e"] is None
