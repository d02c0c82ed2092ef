"""Scalar int8 embedding quantization — the memory lever for ANN at
100 TB: a dim-64 float64 vector is 512 B; symmetric int8 with one
float32 scale is 68 B (~7.5×), which is the difference between an
executor holding 10⁸ vs 10⁹ corpus vectors.

Symmetric per-vector scheme: ``scale = max|vᵢ| / 127``,
``qᵢ = round(vᵢ / scale)`` ∈ [−127, 127].  Cosine similarity is
SCALE-INVARIANT, so quantized cosine is just cosine over the int
arrays — no dequantization in the hot path — with relative error
O(1/127) per component (bounded-error recheck tested in pytest).

Pure column algebra; the rounding (HALF_UP = away from zero, both
Spark and DuckDB) and the division order (``v / scale``, not
``v·127/max``) are pinned so the DuckDB oracle replays quantization
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_embeddings(
    df: DataFrame,
    *,
    vec_column: str = "embedding",
    q_column: str = "q",
    scale_column: str = "scale",
) -> DataFrame:
    """Adds ``q`` (array<int>, each in [−127, 127]) and ``scale``
    (double); the all-zero vector gets scale 0 and zero codes, NULL
    stays NULL."""
    v = F.col(vec_column).cast("array<double>")
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = maxabs / F.lit(127.0)
    q = F.when(
        v.isNull(), F.lit(None).cast("array<int>")
    ).when(
        maxabs == 0.0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(
        F.transform(v, lambda x: F.round(x / scale).cast("int"))
    )
    return df.withColumn(q_column, q).withColumn(
        scale_column,
        F.when(v.isNull(), F.lit(None).cast("double")).otherwise(scale),
    )


def dequantize(q: Column, scale: Column) -> Column:
    """array<double> ≈ the original vector (max error scale/2 per
    component)."""
    return F.transform(q, lambda x: x.cast("double") * scale)
