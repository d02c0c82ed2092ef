"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
(one Python crossing per batch, schema declared up front, batch shape
bounded by spark.sql.execution.arrow.maxRecordsPerBatch).

The actual codec libraries are NOT available in this container, so the
decode kernels are STUBBED with a deterministic fake (documented below)
behind ``use_fake_decoder=True`` / a ``NotImplementedError`` otherwise —
the Spark-side plumbing (schema, partitioning, UDF signature, batching)
is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("record_id", StringType(), False),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def _fake_decode(payload: bytes, feature_dim: int) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decoder: 'dimensions' and 'features' derived
    from a seeded hash of the payload bytes.  Replace with a real codec
    (PIL/ffmpeg) in production; the dataflow is identical."""
    h = np.frombuffer(payload[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.int64)
    width = int(64 + (h.sum() % 1024))
    height = int(64 + ((h * 7).sum() % 1024))
    rng = np.random.RandomState(int(h.sum()) % (2**31 - 1))
    return width, height, rng.rand(feature_dim)


def image_features(
    df: DataFrame,
    *,
    id_column: str = "record_id",
    binary_column: str = "payload",
    feature_dim: int = 16,
    use_fake_decoder: bool = True,
) -> DataFrame:
    """Decode + featurize an image/binary column via mapInPandas.

    Only (id, payload) flow into the Python stage — select first so
    column pruning keeps the Arrow transfer minimal."""
    if not use_fake_decoder:
        raise NotImplementedError(
            "real image codecs are not available in this container; "
            "pass use_fake_decoder=True for the deterministic stub"
        )

    narrow = df.select(
        F.col(id_column).cast("string").alias("record_id"),
        F.col(binary_column).alias("__payload"),
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, payload in zip(pdf["record_id"], pdf["__payload"]):
                if payload is None:
                    out.append((rid, None, None, None, None))
                    continue
                w, h, feats = _fake_decode(bytes(payload), feature_dim)
                out.append((rid, w, h, len(payload), feats.tolist()))
            yield pd.DataFrame(
                out, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields]
            )

    return narrow.mapInPandas(decode, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(
    df: DataFrame,
    *,
    every_n_seconds: float = 1.0,
    duration_column: str = "duration_s",
) -> DataFrame:
    """Video frame-sampling *plan*: one output row per (record, frame
    timestamp) — pure column algebra (sequence + explode); the decode of
    each frame would then go through image_features."""
    n_frames = F.floor(F.col(duration_column) / F.lit(every_n_seconds)).cast("long")
    return df.withColumn(
        "frame_ts",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                lambda i: i.cast("double") * every_n_seconds,
            )
        ),
    )
