"""Bloom-filter membership index as a DataFrame — the broadcast
prefilter for incremental dedup.

When a daily batch lands against a 10^12-document history, the
expensive question is "which of these fingerprints might we have
seen?".  Joining the batch against the full history shuffles the
history; a Bloom filter of the historical fingerprints answers with
zero false NEGATIVES at ~10 bits/key, and here it is literally a
DataFrame of (word_idx, bits) int64 rows, so it is:

  * built with ONE groupBy(word)+bit_or aggregation (map-side combine),
  * mergeable across partitions/days by unioning and re-bit_or-ing,
  * broadcast-able into the batch-side probe join (n_bits/8 bytes
    dense upper bound; sparse rows only for set words), and
  * probed with a word equi-join + bitwise AND — no UDF anywhere.

Definite-miss rows skip the full history join entirely; only
might-contain rows (true hits + the tunable false-positive tail)
proceed.  Hashes are the repo's cross-engine md5 slice
(``conv(substr(md5(key:seed:i),1,8),16,10)``), so the whole structure
is replayable bit-for-bit by the ANSI-SQL oracle.  Words are 32-bit
(shift ≤ 31) to stay positive in signed int64 across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_BITS = 32


def _position(key: Column, i: int, n_bits: int, seed: int) -> Column:
    """i-th bit position of ``key``: 32-bit md5 slice mod n_bits."""
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(f":{seed}:{i}"))), 1, 8),
        16,
        10,
    ).cast("long")
    return h % n_bits


def _check_params(n_bits: int, n_hashes: int) -> None:
    if n_bits < _WORD_BITS or n_bits % _WORD_BITS != 0:
        raise ValueError(
            f"n_bits must be a positive multiple of {_WORD_BITS}, got {n_bits}"
        )
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")


def bloom_build(
    df: DataFrame,
    key: str,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
    seed: int = 42,
) -> DataFrame:
    """→ DataFrame(word_idx, bits): the sparse word table of a Bloom
    filter over the DISTINCT non-null string values of ``key``.
    Union several builds and ``groupBy(word_idx).agg(bit_or(bits))``
    to merge filters (same n_bits/n_hashes/seed)."""
    _check_params(n_bits, n_hashes)
    k = F.col(key).cast("string")
    keys = df.select(k.alias("__k")).where(k.isNotNull()).distinct()
    pos = keys.select(
        F.explode(
            F.array(
                *[_position(F.col("__k"), i, n_bits, seed) for i in range(n_hashes)]
            )
        ).alias("__p")
    )
    return (
        pos.select(
            F.shiftright(F.col("__p"), 5).alias("word_idx"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(__p % 32 AS INT))"
            ).alias("__m"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__m").alias("bits"))
    )


def bloom_might_contain(
    probes: DataFrame,
    bloom: DataFrame,
    key: str,
    *,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
    seed: int = 42,
    out: str = "might_contain",
    broadcast_bloom: bool = True,
) -> DataFrame:
    """→ ``probes`` + boolean ``out``: True iff every hash position of
    the probe's ``key`` is set in ``bloom`` (never falsely False for an
    inserted key; falsely True at the filter's FP rate).  NULL keys
    probe False.

    The probe is per DISTINCT key value: explode to (key, word, mask),
    one equi-join against the (broadcast) word table, an all-positions
    AND, then one narrow join back onto ``probes``.
    """
    _check_params(n_bits, n_hashes)
    b = F.broadcast(bloom) if broadcast_bloom else bloom
    k = F.col(key).cast("string")
    keys = probes.select(k.alias("__k")).where(k.isNotNull()).distinct()
    pos = keys.select(
        "__k",
        F.explode(
            F.array(
                *[_position(F.col("__k"), i, n_bits, seed) for i in range(n_hashes)]
            )
        ).alias("__p"),
    ).select(
        "__k",
        F.shiftright(F.col("__p"), 5).alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 32 AS INT))").alias(
            "__m"
        ),
    )
    checked = (
        pos.join(b, "word_idx", "left")
        .withColumn(
            "__hit",
            F.col("bits").isNotNull()
            & (F.col("bits").bitwiseAND(F.col("__m")) == F.col("__m")),
        )
        .groupBy("__k")
        .agg(F.min("__hit").alias("__all_hit"))
    )
    return probes.join(
        checked, k == F.col("__k"), "left"
    ).select(
        *probes.columns,
        F.coalesce(F.col("__all_hit"), F.lit(False)).alias(out),
    )
