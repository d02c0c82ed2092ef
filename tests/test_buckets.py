import pytest
from pyspark.sql import functions as F

from mismo_spark.textqa.buckets import quality_buckets, score_cutpoints


def test_cutpoints_global_and_grouped(spark):
    df = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(1, 101)]
        + [(i, "de", float(i) * 10) for i in range(1, 11)],
        "doc_id long, lang string, score double",
    )
    g = score_cutpoints(df, "score", cuts=(0.5,)).first()
    # 110 values; quantile_cont at 0.5 interpolates rank 54.5 (0-based)
    assert g["cut_1"] == pytest.approx(50.5)
    rows = {
        r["lang"]: r["cut_1"]
        for r in score_cutpoints(df, "score", by=["lang"], cuts=(0.5,)).collect()
    }
    assert rows["en"] == pytest.approx(50.5)
    assert rows["de"] == pytest.approx(55.0)
    with pytest.raises(ValueError, match="cuts"):
        score_cutpoints(df, "score", cuts=(0.5, 0.25))
    with pytest.raises(ValueError, match="cuts"):
        score_cutpoints(df, "score", cuts=())


def test_quality_buckets_terciles(spark):
    # perplexity convention: LOW score = head (bucket 0)
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(1, 10)], "doc_id long, ppl double"
    )
    out = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(df, "ppl", cuts=(1 / 3, 2 / 3)).collect()
    }
    # cuts at ranks (1/3)*8 = 2.667 -> 3.667, (2/3)*8 -> 6.333
    assert [out[i] for i in range(1, 10)] == [0, 0, 0, 1, 1, 1, 2, 2, 2]


def test_quality_buckets_labels_descending_nulls(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0), (3, 3.0), (4, None)], "doc_id long, q double"
    )
    out = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(
            df,
            "q",
            cuts=(1 / 3, 2 / 3),
            labels=("head", "middle", "tail"),
            ascending=False,
        ).collect()
    }
    # higher-is-better: 3.0 = head, 1.0 = tail; NULL stays NULL
    assert out == {1: "tail", 2: "middle", 3: "head", 4: None}
    with pytest.raises(ValueError, match="labels"):
        quality_buckets(df, "q", cuts=(0.5,), labels=("a", "b", "c"))


def test_grouped_buckets_match_per_group_split(spark):
    # each language is tiered against its own distribution
    df = spark.createDataFrame(
        [(i, "en", float(i)) for i in range(1, 31)]
        + [(100 + i, "de", 1000.0 + i) for i in range(1, 31)],
        "doc_id long, lang string, score double",
    )
    out = quality_buckets(df, "score", by=["lang"], cuts=(1 / 3, 2 / 3))
    per = (
        out.groupBy("lang", "bucket").count().orderBy("lang", "bucket").collect()
    )
    assert [(r["lang"], r["bucket"], r["count"]) for r in per] == [
        ("de", 0, 10),
        ("de", 1, 10),
        ("de", 2, 10),
        ("en", 0, 10),
        ("en", 1, 10),
        ("en", 2, 10),
    ]
    # every German doc outscores every English one, yet each language
    # still has a head tier — the point of per-group cut points
    heads = {
        r["lang"]
        for r in out.where(F.col("bucket") == 0).select("lang").distinct().collect()
    }
    assert heads == {"en", "de"}


def test_tie_goes_to_better_tier(spark):
    # 6 equal scores + 3 higher: the 50th-percentile cut equals the
    # repeated value, and ties land DOWN (ascending: better tier)
    df = spark.createDataFrame(
        [(i, 5.0) for i in range(6)] + [(10 + i, 9.0) for i in range(3)],
        "doc_id long, s double",
    )
    out = {r["doc_id"]: r["bucket"] for r in quality_buckets(df, "s", cuts=(0.5,)).collect()}
    assert all(out[i] == 0 for i in range(6))
    assert all(out[10 + i] == 1 for i in range(3))


def test_null_group_key_buckets_against_its_own_group(spark):
    # NULL lang is a real group: its docs must get buckets from the
    # NULL group's own cut points, not NULL buckets
    rows = [(i, None, float(i)) for i in range(1, 10)] + [
        (100 + i, "en", 1000.0 + i) for i in range(1, 10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    out = {
        r["doc_id"]: r["bucket"]
        for r in quality_buckets(df, "score", by=["lang"], cuts=(1 / 3, 2 / 3)).collect()
    }
    assert [out[i] for i in range(1, 10)] == [0, 0, 0, 1, 1, 1, 2, 2, 2]
    assert None not in {out[100 + i] for i in range(1, 10)}
