"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata
struct; decode/feature-extraction runs as Arrow-batched ``mapInPandas``
(one Python crossing per batch, schema declared up front, batch shape
bounded by spark.sql.execution.arrow.maxRecordsPerBatch).

The actual codec libraries are NOT available in this container, so the
DECODE kernels are STUBBED with a deterministic fake (documented below)
behind ``use_fake_decoder=True`` / a ``NotImplementedError`` otherwise —
the Spark-side plumbing (schema, partitioning, UDF signature, batching)
is real and tested.

The perceptual-hash family (:func:`phash64`,
:func:`phash_near_duplicates`) is NOT a stub: grid-dHash over the raw
payload bytes is codec-free by construction, deterministic, oracle-
verified against a pure-SQL DuckDB replay, and pairs via the SimHash
block-permutation blocking.  With real codecs, decode to grayscale
pixel bytes first and feed those to the same grid/compare/pack stages.
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


PHASH_BYTE_CAP = 4608  # 72 cells × 64 bytes: bounded work per payload
_PHASH_SCHEMA = StructType(
    [
        StructField("record_id", LongType(), False),
        StructField("ph", LongType(), True),
    ]
)


def _phash_batch(payloads: list) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized grid-dHash over one Arrow batch of binary payloads.

    Kernel definition (the oracle-replayable spec):

    1. Take the first ``min(len, 4608)`` bytes of the payload; payloads
       shorter than 72 bytes (or NULL) hash to NULL — no 72-cell grid
       exists for them.
    2. Split those ``M`` bytes into 72 contiguous chunks — an 8×9 grid
       in row-major order; byte ``i`` belongs to cell ``(i*72) // M``
       (floor boundaries, so chunk sizes differ by at most one byte).
    3. dHash: bit ``r*8 + c`` (r,c ∈ 0..7) is set iff the mean byte
       value of cell ``(r, c+1)`` exceeds that of cell ``(r, c)`` —
       compared cross-multiplied in integers (``sum_r·n_l > sum_l·n_r``)
       so there is no float rounding to disagree across engines.
    4. Pack the 64 bits into a signed int64 (bit 63 = sign, two's
       complement — same value DuckDB reaches via HUGEINT wrap).

    This is the classic difference-hash resampled onto a byte grid
    instead of decoded pixels: deterministic, codec-free, and robust to
    small localized edits of the payload (each edit perturbs one or two
    of the 72 chunk means).  When real codecs are available, decode to
    grayscale pixels first and feed THOSE bytes — the grid/compare/pack
    stages are unchanged.

    Every step below is a whole-batch numpy operation (one bincount
    over the concatenated bytes of the batch) — no per-row Python.

    Returns ``(ph, missing)``: int64 hashes (0 where missing) and the
    missing-mask — int64 end to end, since a float NaN detour would
    corrupt hashes above 2^53.
    """
    n = len(payloads)
    trimmed = [
        None if p is None or len(p) < 72 else bytes(p[:PHASH_BYTE_CAP])
        for p in payloads
    ]
    valid = np.array([t is not None for t in trimmed], dtype=bool)
    out = np.zeros(n, dtype=np.int64)
    if not valid.any():
        return out, ~valid
    kept = [t for t in trimmed if t is not None]
    lens = np.array([len(t) for t in kept], dtype=np.int64)
    concat = np.frombuffer(b"".join(kept), dtype=np.uint8).astype(np.int64)
    nv = len(kept)
    row_of_byte = np.repeat(np.arange(nv, dtype=np.int64), lens)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos_in_row = np.arange(concat.size, dtype=np.int64) - offsets[row_of_byte]
    cell = (pos_in_row * 72) // lens[row_of_byte]
    key = row_of_byte * 72 + cell
    sums = np.bincount(key, weights=concat, minlength=nv * 72).astype(np.int64)
    counts = np.bincount(key, minlength=nv * 72).astype(np.int64)
    gs = sums.reshape(nv, 8, 9)
    gn = counts.reshape(nv, 8, 9)
    bits = (gs[:, :, 1:] * gn[:, :, :8]) > (gs[:, :, :8] * gn[:, :, 1:])
    packed = (
        (bits.reshape(nv, 64).astype(np.uint64) << np.arange(64, dtype=np.uint64))
        .sum(axis=1, dtype=np.uint64)  # disjoint bits: sum == bitwise or
        .view(np.int64)
    )
    out[valid] = packed
    return out, ~valid


def phash64(
    df: DataFrame,
    *,
    id_column: str = "record_id",
    binary_column: str = "payload",
) -> DataFrame:
    """→ (record_id, ph): 64-bit grid-dHash per binary payload.

    Arrow-batched ``mapInPandas`` over the (id, payload) projection
    only; the kernel (see :func:`_phash_batch`) is whole-batch numpy —
    one ``bincount`` per batch, no per-row Python.  Scale shape: map
    only, no shuffle; output is 16 bytes/record regardless of payload
    size, so the downstream Hamming banding never touches the binary
    column."""
    narrow = df.select(
        F.col(id_column).cast("long").alias("record_id"),
        F.col(binary_column).alias("__payload"),
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ph, missing = _phash_batch(list(pdf["__payload"]))
            yield pd.DataFrame(
                {
                    "record_id": pdf["record_id"].to_numpy(),
                    "ph": pd.arrays.IntegerArray(ph, mask=missing),
                }
            )

    return narrow.mapInPandas(kernel, _PHASH_SCHEMA)


def phash_near_duplicates(
    df: DataFrame,
    *,
    id_column: str = "record_id",
    binary_column: str = "payload",
    max_hamming: int = 6,
    n_blocks: int | None = None,
) -> DataFrame:
    """→ (record_id_l, record_id_r, hamming): ALL payload pairs whose
    grid-dHashes differ in ≤ ``max_hamming`` bits.

    Composition of :func:`phash64` with the SimHash family's
    block-permutation blocking (``dedupe.hamming_banded_pairs``) — the
    pigeonhole guarantee makes the banded result complete at
    ``max_hamming``, verified by the brute-force parity pytest.  NULL
    hashes (payloads < 72 bytes) never pair."""
    from mismo_spark.dedupe import hamming_banded_pairs

    sigs = phash64(df, id_column=id_column, binary_column=binary_column).filter(
        F.col("ph").isNotNull()
    )
    return hamming_banded_pairs(
        sigs, hash_column="ph", max_hamming=max_hamming, n_blocks=n_blocks
    )


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
