"""Property-based tests (hypothesis) for the pure-Python kernels that
back the Arrow pandas UDFs — mirrors the reference's property-style
coverage (SURVEY §5) without paying a JVM per example.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from mismo_spark.text._metaphone import double_metaphone_str
from mismo_spark.text.similarity import (
    _damerau_levenshtein,
    _jaro,
    _jaro_winkler,
)

texts = st.text(max_size=24)
words = st.text(
    alphabet=st.characters(min_codepoint=ord("a"), max_codepoint=ord("z")),
    max_size=12,
)


@settings(max_examples=300, deadline=None)
@given(texts, texts)
def test_dl_symmetric_and_bounded(a, b):
    d = _damerau_levenshtein(a, b)
    assert d == _damerau_levenshtein(b, a)
    assert abs(len(a) - len(b)) <= d <= max(len(a), len(b))


@settings(max_examples=200, deadline=None)
@given(texts)
def test_dl_identity(s):
    assert _damerau_levenshtein(s, s) == 0


@settings(max_examples=200, deadline=None)
@given(texts, st.characters())
def test_dl_single_append_is_one_edit(s, c):
    assert _damerau_levenshtein(s, s + c) == 1


@settings(max_examples=200, deadline=None)
@given(st.characters(), st.characters())
def test_dl_transposition_costs_one(x, y):
    a, b = x + y, y + x
    assert _damerau_levenshtein(a, b) == (0 if x == y else 1)


@settings(max_examples=300, deadline=None)
@given(texts, texts)
def test_jaro_range_and_symmetry(a, b):
    j = _jaro(a, b)
    assert 0.0 <= j <= 1.0
    assert j == _jaro(b, a)


@settings(max_examples=200, deadline=None)
@given(st.text(min_size=1, max_size=24))
def test_jaro_identity(s):
    assert _jaro(s, s) == 1.0


@settings(max_examples=300, deadline=None)
@given(texts, texts)
def test_jw_dominates_jaro(a, b):
    """JW = J + ℓ·p·(1−J) with ℓ·p ≤ 0.4 ⇒ J ≤ JW ≤ 1."""
    j, jw = _jaro(a, b), _jaro_winkler(a, b)
    assert jw >= j - 1e-12
    assert jw <= 1.0 + 1e-12


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=30))
def test_double_metaphone_total_and_deterministic(s):
    """The vendored kernel must be total over arbitrary unicode (it
    feeds a pandas UDF — an exception there kills the whole batch)."""
    p = double_metaphone_str(s)
    assert isinstance(p, tuple) and len(p) == 2
    assert all(isinstance(x, str) for x in p)
    assert p == double_metaphone_str(s)


@settings(max_examples=200, deadline=None)
@given(words)
def test_double_metaphone_codes_are_ascii(w):
    for code in double_metaphone_str(w):
        assert all(ord(c) < 128 for c in code)
