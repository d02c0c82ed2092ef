"""ann.quant: int8 quantization round-trip and quantized-cosine error."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mismo_spark.ann import cosine_pairs
from mismo_spark.ann.quant import dequantize, quantize_embeddings


def _vecs(spark, n=200, dim=16, seed=7):
    rng = np.random.RandomState(seed)
    rows = [(i, rng.randn(dim).tolist()) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_quantize_codes_bounded_and_deterministic(spark):
    q = quantize_embeddings(_vecs(spark))
    rows = q.select(
        F.array_max("q").alias("mx"),
        F.array_min("q").alias("mn"),
        "scale",
    ).collect()
    for r in rows:
        assert -127 <= r["mn"] and r["mx"] <= 127
        assert r["scale"] > 0
    # every vector's largest-magnitude component hits ±127 exactly
    hit = q.select(
        F.array_max(F.transform("q", lambda x: F.abs(x))).alias("m")
    ).collect()
    assert all(r["m"] == 127 for r in hit)


def test_quantize_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None)], "vec_id long, embedding array<double>"
    )
    got = {r["vec_id"]: (r["q"], r["scale"]) for r in quantize_embeddings(df).collect()}
    assert got[1] == ([0, 0], 0.0)
    assert got[2] == (None, None)


def test_dequantize_error_bound(spark):
    q = quantize_embeddings(_vecs(spark))
    err = q.select(
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                dequantize(F.col("q"), F.col("scale")),
                lambda a, b: F.abs(a - b),
            )
        ).alias("e"),
        (F.col("scale") / 2 + 1e-12).alias("bound"),
    ).collect()
    assert all(r["e"] <= r["bound"] for r in err)


def test_quantized_cosine_close_to_exact(spark):
    """Cosine is scale-invariant: scoring the int8 codes directly must
    agree with exact cosine to ~1% on random vectors."""
    v = _vecs(spark, n=100)
    q = quantize_embeddings(v)
    a = q.alias("a")
    b = q.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        cosine_pairs(
            F.col("a.embedding").cast("array<double>"),
            F.col("b.embedding").cast("array<double>"),
        ).alias("exact"),
        cosine_pairs(
            F.col("a.q").cast("array<double>"), F.col("b.q").cast("array<double>")
        ).alias("quant"),
    )
    mx = pairs.agg(F.max(F.abs(F.col("exact") - F.col("quant")))).collect()[0][0]
    assert mx < 0.02, mx
