"""Perceptual hash (grid-dHash) + Hamming-banded near-dup.

Ground truth twice over: a per-row pure-Python implementation of the
documented kernel spec (multimodal/__init__.py:_phash_batch), and the
brute-force O(n²) Hamming join that the banded blocking must reproduce
exactly at max_hamming (pigeonhole completeness).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mismo_spark.multimodal import PHASH_BYTE_CAP, _phash_batch, phash64, phash_near_duplicates


def ref_phash(p: bytes | None) -> int | None:
    """Per-row reference of the documented kernel spec."""
    if p is None or len(p) < 72:
        return None
    b = p[:PHASH_BYTE_CAP]
    m = len(b)
    s, n = [0] * 72, [0] * 72
    for i, by in enumerate(b):
        c = (i * 72) // m
        s[c] += by
        n[c] += 1
    v = 0
    for r in range(8):
        for c in range(8):
            le, ri = r * 9 + c, r * 9 + c + 1
            if s[ri] * n[le] > s[le] * n[ri]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= 1 << 63 else v


def make_payloads(seed: int, n: int) -> list:
    rng = random.Random(seed)
    out = []
    for _ in range(n):
        out.append(bytes(rng.randrange(256) for _ in range(rng.randrange(72, 2000))))
    return out


def test_kernel_matches_reference():
    payloads = make_payloads(1, 40) + [None, b"short" * 3, b"\x00" * 72, b"\xff" * 5000]
    ph, missing = _phash_batch(payloads)
    for i, p in enumerate(payloads):
        expect = ref_phash(p)
        got = None if missing[i] else int(ph[i])
        assert got == expect, i


def test_spark_phash64_plumbing(spark):
    payloads = make_payloads(2, 20) + [None, b"tiny"]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(payloads)], "record_id long, payload binary"
    )
    got = {r.record_id: r.ph for r in phash64(df).collect()}
    assert len(got) == len(payloads)
    for i, p in enumerate(payloads):
        assert got[i] == ref_phash(p), i


def test_banded_completeness_at_max_hamming(spark):
    # payload family with planted near-dups: pairs (2k, 2k+1) share all
    # but one byte-grid cell, so many land within a few bits — banded
    # output must equal the brute-force Hamming join exactly
    rng = random.Random(5)
    rows = []
    for k in range(60):
        base = bytearray(rng.randrange(256) for _ in range(720))
        rows.append((2 * k, bytes(base)))
        twin = bytearray(base)
        for j in range(360, 370):  # one 10-byte cell overwritten
            twin[j] = 126
        rows.append((2 * k + 1, bytes(twin)))
    df = spark.createDataFrame(rows, "record_id long, payload binary")
    for max_h in (2, 3):
        got = sorted(
            (r.record_id_l, r.record_id_r, r.hamming)
            for r in phash_near_duplicates(df, max_hamming=max_h).collect()
        )
        sigs = {i: ref_phash(p) for i, p in rows}
        brute = sorted(
            (a, b, bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1"))
            for a in sigs
            for b in sigs
            if a < b
            and bin((sigs[a] ^ sigs[b]) & ((1 << 64) - 1)).count("1") <= max_h
        )
        assert got == brute
        assert got, "planted twins should produce at least one pair"


def test_short_and_null_payloads_never_pair(spark):
    df = spark.createDataFrame(
        [(0, b"x" * 10), (1, None), (2, b"y" * 500), (3, b"y" * 500)],
        "record_id long, payload binary",
    )
    got = [(r.record_id_l, r.record_id_r) for r in phash_near_duplicates(df).collect()]
    assert got == [(2, 3)]


def test_too_few_blocks_raises(spark):
    df = spark.createDataFrame([(0, b"z" * 100)], "record_id long, payload binary")
    with pytest.raises(ValueError, match="n_blocks"):
        phash_near_duplicates(df, max_hamming=5, n_blocks=4).collect()
