"""Kernel parity: vendored pure-Python similarity kernels vs rapidfuzz.

The vendored kernels are the source of truth (they back every oracle
row); when rapidfuzz is installed, the batch functions switch to its
C++ scorers — this suite pins the two implementations to each other to
1e-9 on adversarial and random inputs, so the swap can never silently
change scores.  Skipped (except the vendored self-checks) when
rapidfuzz is absent, as in this sandbox.
"""

from __future__ import annotations

import random
import string

import pytest

from mismo_spark.text.similarity import (
    HAVE_RAPIDFUZZ,
    _damerau_levenshtein,
    _jaro,
    _jaro_winkler,
)

CASES = [
    ("", ""),
    ("", "abc"),
    ("abc", ""),
    ("abc", "abc"),
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("ca", "abc"),  # OSA vs full DL divergence case: OSA = 3, DL = 2
    ("a" * 100, "a" * 99 + "b"),
    ("dwayne", "duane"),
]


def rand_cases(n: int, seed: int = 13):
    rng = random.Random(seed)
    alpha = string.ascii_lowercase[:6]  # small alphabet: force collisions
    out = []
    for _ in range(n):
        la, lb = rng.randrange(0, 20), rng.randrange(0, 20)
        out.append(
            (
                "".join(rng.choice(alpha) for _ in range(la)),
                "".join(rng.choice(alpha) for _ in range(lb)),
            )
        )
    return out


def test_vendored_kernel_pinned_values():
    # classic published Jaro/JW values, exact to double precision
    assert _jaro("martha", "marhta") == pytest.approx(0.9444444444444445, abs=1e-12)
    assert _jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111111111, abs=1e-12)
    assert _jaro("dixon", "dicksonx") == pytest.approx(0.7666666666666666, abs=1e-12)
    assert _jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133333333333332, abs=1e-12)
    assert _damerau_levenshtein("ca", "abc") == 3  # OSA, not unrestricted DL


@pytest.mark.skipif(not HAVE_RAPIDFUZZ, reason="rapidfuzz not installed")
def test_rapidfuzz_parity_jaro():
    from rapidfuzz.distance import Jaro

    for a, b in CASES + rand_cases(500):
        assert Jaro.similarity(a, b) == pytest.approx(_jaro(a, b), abs=1e-9), (a, b)


@pytest.mark.skipif(not HAVE_RAPIDFUZZ, reason="rapidfuzz not installed")
def test_rapidfuzz_parity_jaro_winkler():
    from rapidfuzz.distance import JaroWinkler

    for a, b in CASES + rand_cases(500):
        assert JaroWinkler.similarity(a, b) == pytest.approx(
            _jaro_winkler(a, b), abs=1e-9
        ), (a, b)


@pytest.mark.skipif(not HAVE_RAPIDFUZZ, reason="rapidfuzz not installed")
def test_rapidfuzz_parity_osa():
    from rapidfuzz.distance import OSA

    for a, b in CASES + rand_cases(500):
        assert OSA.distance(a, b) == _damerau_levenshtein(a, b), (a, b)


def full_ascii_cases(n: int, seed: int = 29):
    """Adversarial ASCII pairs over the whole 1..127 range (incl.
    whitespace/punctuation/control chars) with near-duplicate bias."""
    rng = random.Random(seed)
    chars = [chr(i) for i in range(1, 128)]
    out = []
    for _ in range(n):
        a = "".join(rng.choice(chars) for _ in range(rng.randrange(0, 40)))
        if rng.random() < 0.5 and a:
            b = list(a)
            for _ in range(rng.randrange(0, 4)):
                b[rng.randrange(len(b))] = rng.choice(chars)
            b = "".join(b)
        else:
            b = "".join(rng.choice(chars) for _ in range(rng.randrange(0, 40)))
        out.append((a, b))
    return out


def test_duckdb_batch_parity_bit_exact():
    """The DuckDB fast path inside _jaro_batch/_jw_batch must be
    BIT-IDENTICAL (==, not approx) to the vendored kernels: these
    scores are quantized to micro-ints that drive greedy scan orders,
    so even 1-ulp drift could flip a rounding boundary."""
    import numpy as np

    from mismo_spark.text.similarity import HAVE_DUCKDB, _jaro_batch, _jw_batch

    if not HAVE_DUCKDB:
        pytest.skip("duckdb not installed")
    cases = CASES + rand_cases(500) + full_ascii_cases(2000)
    # non-ASCII rows must route to the vendored kernel (code points,
    # not UTF-8 bytes) and empty-vs-empty must stay 1.0
    cases += [("müller", "mueller"), ("日本語", "日本語x"), ("", ""), ("café", "cafe")]
    a = np.array([c[0] for c in cases], dtype=object)
    b = np.array([c[1] for c in cases], dtype=object)
    got_j = _jaro_batch(a, b)
    got_jw = _jw_batch(a, b)
    for i, (x, y) in enumerate(cases):
        assert got_j[i] == _jaro(x, y), (x, y, got_j[i], _jaro(x, y))
        assert got_jw[i] == _jaro_winkler(x, y), (x, y, got_jw[i], _jaro_winkler(x, y))
