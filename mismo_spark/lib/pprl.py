"""Privacy-preserving record linkage: Bloom-encoded names (CLK).

Schnell, Bachteler & Reiher, "Privacy-preserving record linkage using
Bloom filters" (BMC MIRM 2009): each identifier is reduced to padded
character bigrams, every bigram sets k positions of an m-bit Bloom
vector, and two encodings are compared with the Dice coefficient —
similar names give similar bit patterns WITHOUT either party revealing
the cleartext.  The cryptographic long-term key (CLK, Schnell 2011)
hashes several identifier fields into ONE vector per record.

This module keeps the mathematics engine-portable by working on the
*sorted distinct position set* (``array<long>``) as the canonical
encoding: Dice over position sets is bit-identical to Dice over the
packed bitvector (collisions collapse the same way in both), the md5
position hash replays exactly in ANSI SQL
(``('0x' || substr(md5(gram:seed:i),1,8))::BIGINT % m`` — the repo's
cross-engine hash family, dedupe/bloom.py:34), and the set form stays
a plain column for blocking, joins and oracles.  ``clk_pack`` packs
positions into ``array<long>`` words (64-bit) for storage/transport,
and ``dice_packed`` scores the packed form via ``bit_count`` —
asserted equal to the set form in tests.

Everything is JVM higher-order-function algebra: no UDF, no explode —
one row in, one row out, so encoding is a map-only projection at any
scale.  Compare cost per pair is O(positions) array intersection,
exactly like the token-Jaccard comparers.

Security note (honest caveat, same as the literature): basic CLK is
vulnerable to frequency attacks on common names; mitigations (salted
per-pair keys, balanced codes, xor-folding) change the encoding, not
the Spark plumbing here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from mismo_spark.text.features import ngrams

_WORD = 64


def _check(n_bits: int, n_hashes: int) -> None:
    if n_bits < _WORD or n_bits % _WORD != 0:
        raise ValueError(f"n_bits must be a positive multiple of {_WORD}, got {n_bits}")
    if n_hashes < 1:
        raise ValueError(f"n_hashes must be >= 1, got {n_hashes}")


def clk_positions(
    *cols: Column,
    n_bits: int = 1024,
    n_hashes: int = 2,
    seed: int = 42,
) -> Column:
    """Encode one or more identifier columns into the sorted distinct
    set of Bloom positions (``array<long>``) — the canonical CLK.

    Each column is lowercased, whitespace-trimmed and padded with
    ``_`` sentinels (so first/last characters carry positional
    signal), reduced to character bigrams, and every bigram sets
    ``n_hashes`` md5-derived positions in ``[0, n_bits)``.  A NULL
    column contributes nothing; all-NULL rows encode to ``[]``."""
    _check(n_bits, n_hashes)
    gram_arrays = []
    for c in cols:
        s = F.lower(F.trim(c))
        padded = F.concat(F.lit("_"), s, F.lit("_"))
        gram_arrays.append(
            F.when(c.isNull(), F.array().cast("array<string>")).otherwise(
                ngrams(padded, 2)
            )
        )
    grams = F.array_distinct(F.flatten(F.array(*gram_arrays)))
    idx = F.sequence(F.lit(0), F.lit(n_hashes - 1))
    positions = F.flatten(
        F.transform(
            grams,
            lambda g: F.transform(
                idx,
                lambda i: F.conv(
                    F.substring(
                        F.md5(
                            F.concat(g, F.lit(f":{seed}:"), i.cast("string"))
                        ),
                        1,
                        8,
                    ),
                    16,
                    10,
                ).cast("long")
                % n_bits,
            ),
        )
    )
    return F.array_sort(F.array_distinct(positions))


def clk_pack(positions: Column, *, n_bits: int = 1024) -> Column:
    """Pack a position set into ``n_bits/64`` little-endian 64-bit
    words (``array<long>``) — the storage/transport form."""
    if n_bits < _WORD or n_bits % _WORD != 0:
        raise ValueError(f"n_bits must be a positive multiple of {_WORD}, got {n_bits}")
    words = F.sequence(F.lit(0), F.lit(n_bits // _WORD - 1))
    return F.transform(
        words,
        lambda w: F.aggregate(
            F.filter(positions, lambda p: (p / _WORD).cast("long") == w),
            F.lit(0).cast("long"),
            # F.shiftleft's wrapper only takes a literal shift; the SQL
            # function itself accepts a column — call it directly
            lambda acc, p: acc.bitwiseOR(
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % _WORD).cast("int")
                )
            ),
        ),
    )


def clk_packed_words(
    df,
    keys: list[str],
    cols: list[str],
    *,
    n_bits: int = 1024,
    n_hashes: int = 2,
    seed: int = 42,
    out_prefix: str = "w",
    n_col: str = "n",
):
    """Relational CLK encoder: ``df`` → one row per ``keys`` with the
    packed Bloom words as FLAT long columns ``{out_prefix}0..{k-1}``
    plus ``n_col`` = number of set bits (= ``size(clk_positions(...))``).

    Same positions as :func:`clk_positions` + :func:`clk_pack` (same
    gram construction, same md5 slice, asserted equal in
    tests/test_pprl.py) but computed via explode → top-level md5
    projection → ``bit_or`` aggregation — whole-stage-codegen'd
    end-to-end, where the HOF form interprets ~100 md5 lambdas per row
    (guide §1.2: fix the per-task work).  Rows whose identifier columns
    are all NULL/empty-gram encode to all-zero words with ``n`` = 0,
    exactly like the ``[]`` position set.  One shuffle (the groupBy);
    the gram explosion is bounded by total identifier length.
    """
    _check(n_bits, n_hashes)
    n_words = n_bits // _WORD
    gram_arrays = []
    for c in cols:
        col = F.col(c)
        s = F.lower(F.trim(col))
        padded = F.concat(F.lit("_"), s, F.lit("_"))
        gram_arrays.append(
            F.when(col.isNull(), F.array().cast("array<string>")).otherwise(
                ngrams(padded, 2)
            )
        )
    grams = F.array_distinct(F.flatten(F.array(*gram_arrays)))
    base = df.select(*keys, F.explode_outer(grams).alias("__g"))
    pos_rows = base.select(
        *keys,
        F.explode(
            F.array(
                *[
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.col("__g"), F.lit(f":{seed}:{i}"))),
                            1,
                            8,
                        ),
                        16,
                        10,
                    ).cast("long")
                    % n_bits
                    for i in range(n_hashes)
                ]
            )
        ).alias("__p"),
    )
    word = (F.col("__p") / _WORD).cast("int")
    bit = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.col("__p") % _WORD).cast("int")
    )
    agg = pos_rows.groupBy(*keys).agg(
        *[
            F.coalesce(
                F.bit_or(F.when(word == i, bit)), F.lit(0).cast("long")
            ).alias(f"{out_prefix}{i}")
            for i in range(n_words)
        ]
    )
    n_expr = None
    for i in range(n_words):
        t = F.bit_count(F.col(f"{out_prefix}{i}"))
        n_expr = t if n_expr is None else n_expr + t
    return agg.withColumn(n_col, n_expr.cast("int"))


def dice_positions(a: Column, b: Column) -> Column:
    """Dice coefficient of two position-set encodings:
    ``2|A∩B| / (|A|+|B|)``; 0.0 when both are empty."""
    inter = F.size(F.array_intersect(a, b))
    denom = F.size(a) + F.size(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(
        2.0 * inter / denom
    )


def dice_packed(a: Column, b: Column) -> Column:
    """Dice over packed bitvectors via ``bit_count`` on the AND-ed
    words — equal to :func:`dice_positions` on the same encodings."""
    ones = lambda v: F.aggregate(  # noqa: E731 - local alias
        v, F.lit(0).cast("long"), lambda acc, w: acc + F.bit_count(w)
    )
    inter = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.bit_count(x.bitwiseAND(y))),
        F.lit(0).cast("long"),
        lambda acc, n: acc + n,
    )
    denom = ones(a) + ones(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(2.0 * inter / denom)
