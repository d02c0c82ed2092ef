"""Round-5 additions: slim-exchange ANN plans, vectorized cosine,
byte-gated broadcast policy, schema-typed Updates validation."""

from __future__ import annotations

import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from mismo_spark._util import estimate_broadcast_bytes, should_broadcast
from mismo_spark.ann import (
    _cosine,
    cosine_pairs,
    cosine_topk,
    embedding_near_duplicates,
)
from mismo_spark.dedupe import minhash_near_duplicates


def _shuffle_exchanges(df) -> list[str]:
    """The plan's shuffle (non-broadcast) Exchange lines."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.findall(
        r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)[^\n]*",
        plan,
    )


def _docs(spark):
    rows = [
        (i, f"the quick brown fox jumps over dog number {i % 7} again and again")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "record_id long, text string")


def test_minhash_near_dup_broadcast_no_pair_shuffle(spark):
    nd = minhash_near_duplicates(
        _docs(spark),
        shingle_size=2,
        band_size=2,
        n_bands=8,
        min_jaccard=0.3,
        broadcast_records=True,
    )
    # the only shuffles should be the narrow (record_id, band-signature)
    # aggregations — never the shingle arrays, never the pair table
    for line in _shuffle_exchanges(nd):
        assert "shingles" not in line, line


def test_minhash_near_dup_broadcast_matches_shuffle(spark):
    kw = dict(shingle_size=2, band_size=2, n_bands=8, min_jaccard=0.3)
    a = minhash_near_duplicates(_docs(spark), broadcast_records=True, **kw)
    b = minhash_near_duplicates(_docs(spark), broadcast_records=False, **kw)
    key = lambda r: (r["record_id_l"], r["record_id_r"], round(r["jaccard_sim"], 9))  # noqa: E731
    assert sorted(map(key, a.collect())) == sorted(map(key, b.collect()))
    assert a.count() > 0


def _unit_vectors(n: int, dim: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    v = rng.randn(n, dim)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _vec_df(spark, vecs, start_id=0):
    rows = [(start_id + i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_near_dup_vectors_not_in_shuffle(spark):
    base = _unit_vectors(20, 64, seed=7)
    planted = base[:5] + 0.01 * _unit_vectors(5, 64, seed=8)
    df = _vec_df(spark, base).unionByName(_vec_df(spark, planted, start_id=100))
    nd = embedding_near_duplicates(
        df, min_cosine=0.95, dim=64, seed=42, broadcast_vectors=True
    )
    # vectors ride only the broadcast (narrow id→vec table); every
    # shuffled row is (id, bucket) / (id_l, id_r)
    for line in _shuffle_exchanges(nd):
        assert "embedding" not in line and "__v" not in line, line


def test_cosine_pairs_matches_hof(spark):
    rng = np.random.RandomState(3)
    rows = [
        ([float(x) for x in rng.randn(16)], [float(y) for y in rng.randn(16)])
        for _ in range(50)
    ]
    df = spark.createDataFrame(rows, "a array<double>, b array<double>")
    got = df.select(
        cosine_pairs(F.col("a"), F.col("b")).alias("fast"),
        _cosine(F.col("a"), F.col("b")).alias("ref"),
    ).collect()
    for r in got:
        assert r["fast"] == pytest.approx(r["ref"], abs=1e-12)


def test_cosine_pairs_null_input(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0], None), (None, [1.0, 2.0]), ([1.0, 0.0], [0.0, 1.0])],
        "a array<double>, b array<double>",
    )
    got = df.select(cosine_pairs(F.col("a"), F.col("b")).alias("c")).collect()
    vals = [r["c"] for r in got]
    assert vals[0] is None and vals[1] is None
    assert vals[2] == pytest.approx(0.0)


def test_cosine_topk_matches_numpy(spark):
    corpus = _unit_vectors(60, 32, seed=11)
    cdf = _vec_df(spark, corpus).repartition(5)
    qdf = _vec_df(spark, corpus[:4])  # queries are corpus rows 0..3
    out = cosine_topk(cdf, qdf, k=5)
    got = {
        (r["query_id"], r["neighbour_id"]): r["cosine"] for r in out.collect()
    }
    sims = corpus @ corpus.T
    for q in range(4):
        order = sorted(
            (i for i in range(60) if i != q), key=lambda i: (-sims[q, i], i)
        )[:5]
        for i in order:
            assert got[(q, i)] == pytest.approx(sims[q, i], abs=1e-9)
    assert len(got) == 4 * 5


def test_cosine_topk_empty_queries(spark):
    cdf = _vec_df(spark, _unit_vectors(5, 8, seed=1))
    out = cosine_topk(cdf, cdf.filter(F.col("vec_id") < 0), k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbour_id", "cosine"]


def test_estimate_broadcast_bytes(spark):
    df = spark.createDataFrame(
        [(i, "x" * 100) for i in range(1000)], "id long, payload string"
    )
    est = estimate_broadcast_bytes(df)
    # ≥ payload bytes, ≤ a small multiple (JSON overhead)
    assert 100 * 1000 <= est <= 100 * 1000 * 3
    assert should_broadcast(df, max_bytes=1 << 20)
    assert not should_broadcast(df, max_bytes=10_000)


def test_updates_apply_type_mismatch_raises(spark):
    from mismo_spark.types.updates import Updates

    before = spark.createDataFrame([(1, "a")], "record_id long, v string")
    after = spark.createDataFrame([(1, "b")], "record_id long, v string")
    ups = Updates.from_tables(before, after, join_on="record_id")
    wrong = spark.createDataFrame([(1, 2)], "record_id long, v long")
    with pytest.raises(ValueError, match="schema"):
        ups.apply_to(wrong)


def test_nickname_csv_loader_through_name_comparer(spark):
    import os

    from mismo_spark.lib.name import (
        NameComparer,
        NameMatchLevel,
        load_nickname_pairs,
        with_nickname_match,
    )

    path = os.path.join(os.path.dirname(__file__), "fixtures", "nicknames.csv")
    pairs = load_nickname_pairs(path)
    assert len(pairs) >= 100
    assert ("THEODORE", "TED") in pairs

    def name(given, surname):
        return (None, given, None, surname, None, None)

    schema_one = (
        "struct<prefix:string,given:string,middle:string,"
        "surname:string,suffix:string,nickname:string>"
    )
    rows = [
        (name("SUSAN", "SMITH"), name("SUZY", "SMITH")),       # fixture-only pair
        (name("PEGGY", "JONES"), name("MARGARET", "JONES")),   # reverse direction
        (name("XELDA", "SMITH"), name("QUORN", "SMITH")),      # no alias
    ]
    df = spark.createDataFrame(rows, f"name_l {schema_one}, name_r {schema_one}")
    out = NameComparer(nickname_pairs=path)(df).collect()
    levels = [r["name_l_vs_name_r"] for r in out]
    assert levels[0] == int(NameMatchLevel.NICKNAMES)
    assert levels[1] == int(NameMatchLevel.NICKNAMES)
    assert levels[2] == int(NameMatchLevel.ELSE)

    # SUSAN/SUZY is NOT in the r4 bundled default table
    # (lib/data/nicknames.csv) — distinguishes the explicit-CSV path
    # from the default
    default_out = NameComparer()(df).collect()
    assert default_out[0]["name_l_vs_name_r"] != int(NameMatchLevel.NICKNAMES)

    # DataFrame-join path accepts the CSV too
    flat = spark.createDataFrame(
        [("Theodore", "Ted"), ("Alice", "Bob")], "a string, b string"
    )
    got = {r["a"]: r["is_nickname_match"] for r in with_nickname_match(
        flat, "a", "b", pairs=path
    ).collect()}
    assert got == {"Theodore": True, "Alice": False}


def test_double_metaphone_reference_vectors(spark):
    from mismo_spark.text.similarity import double_metaphone

    # the reference's own expectations
    # (mismo/text/tests/test_similarity.py:9-22)
    cases = [
        ("hello", ["HL", "HL"]),
        ("world", ["ARLT", "FRLT"]),
        ("hello world", ["HLRLT", "HLRLT"]),
        ("catherine", ["K0RN", "KTRN"]),
        ("", ["", ""]),
        (None, None),
    ]
    df = spark.createDataFrame([(s,) for s, _ in cases], "s string")
    got = {
        r["s"]: r["dm"]
        for r in df.select("s", double_metaphone(F.col("s")).alias("dm")).collect()
    }
    for s, expected in cases:
        assert got[s] == expected, (s, got[s])


def test_ivf_partitioned_write_prunes_probes(spark, tmp_path):
    from mismo_spark.ann.ivf import ivf_assign, train_centroids

    vecs = _unit_vectors(200, 16, seed=5)
    df = _vec_df(spark, vecs)
    centroids = train_centroids(df, n_lists=4, sample_size=200, seed=5)
    path = str(tmp_path / "ivf_corpus")
    ivf_assign(df, centroids).write.partitionBy("cell").parquet(path)

    indexed = spark.read.parquet(path)
    probed = indexed.filter(F.col("cell").isin(0, 2))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the cell predicate must reach the scan as a partition filter,
    # not a post-scan Filter: that is what makes probes prune
    assert "PartitionFilters" in plan
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan[:2000]
    # and the scan reads only the probed cells' files
    files = {r["f"] for r in probed.select(
        F.input_file_name().alias("f")
    ).distinct().collect()}
    assert files and all("cell=0" in f or "cell=2" in f for f in files)
