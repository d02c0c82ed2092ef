"""Bloom filter as a DataFrame: no false negatives, merge law,
FP behaviour, null handling, parameter validation."""

import pytest
from pyspark.sql import functions as F

from mismo_spark.dedupe.bloom import bloom_build, bloom_might_contain


def _members(spark, n=200):
    return spark.range(n).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("fp")
    )


def test_no_false_negatives(spark):
    members = _members(spark)
    bloom = bloom_build(members, "fp", n_bits=1 << 12, n_hashes=3)
    probed = bloom_might_contain(
        members, bloom, "fp", n_bits=1 << 12, n_hashes=3
    )
    assert probed.where(~F.col("might_contain")).count() == 0


def test_non_members_mostly_miss(spark):
    members = _members(spark)
    bloom = bloom_build(members, "fp", n_bits=1 << 14, n_hashes=3)
    outsiders = spark.range(200).select(
        F.concat(F.lit("other-"), F.col("id")).alias("fp")
    )
    hits = (
        bloom_might_contain(outsiders, bloom, "fp", n_bits=1 << 14, n_hashes=3)
        .where(F.col("might_contain"))
        .count()
    )
    # 200 keys * 3 hashes in 16384 bits -> FP rate well under 5%
    assert hits <= 10


def test_merge_is_union(spark):
    a = _members(spark, 50)
    b = spark.range(50, 100).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("fp")
    )
    kw = dict(n_bits=1 << 12, n_hashes=3)
    merged = (
        bloom_build(a, "fp", **kw)
        .unionByName(bloom_build(b, "fp", **kw))
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )
    whole = bloom_build(a.unionByName(b), "fp", **kw)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_null_keys_probe_false(spark):
    members = _members(spark, 10)
    bloom = bloom_build(members, "fp", n_bits=1 << 12)
    probes = spark.createDataFrame([("doc-1",), (None,)], "fp string")
    rows = {
        r["fp"]: r["might_contain"]
        for r in bloom_might_contain(
            probes, bloom, "fp", n_bits=1 << 12
        ).collect()
    }
    assert rows["doc-1"] is True and rows[None] is False


def test_param_validation(spark):
    members = _members(spark, 5)
    with pytest.raises(ValueError):
        bloom_build(members, "fp", n_bits=100)  # not a multiple of 32
    with pytest.raises(ValueError):
        bloom_build(members, "fp", n_bits=1 << 12, n_hashes=0)
