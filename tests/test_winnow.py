"""Winnowing fingerprints: guarantee, exact parity with a pure-Python
reference implementation, and the boilerplate df cap."""

import hashlib

import pytest

from mismo_spark.textqa.winnow import winnow_candidate_pairs, winnow_fingerprints


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, str]]:
    """Reference implementation straight from the paper: k-gram md5
    sequence, sliding window of w, keep the min (rightmost on ties)."""
    toks = text.lower().split()
    hashes = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()
        for i in range(len(toks) - k + 1)
    ]
    out: set[tuple[int, str]] = set()
    for start in range(len(hashes) - w + 1):
        window = hashes[start : start + w]
        m = min(window)
        # rightmost occurrence of the min
        pos = start + max(i for i, h in enumerate(window) if h == m)
        out.add((pos, hashes[pos]))
    return out


DOCS = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "pack my box with five dozen liquor jugs the quick brown fox"),
    (3, "short doc"),
    (4, "a a a a a a a a a a"),  # degenerate: all grams identical
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(df, k=3, w=4).collect()
    }
    want = {
        (doc_id, pos, fp)
        for doc_id, text in DOCS
        if len(text.split()) >= 3 + 4 - 1
        for pos, fp in _py_winnow(text, 3, 4)
    }
    assert got == want
    assert not any(d == 3 for d, _, _ in got)  # too short, emits nothing


def test_shared_run_guarantee(spark):
    # docs share exactly a (w + k - 1)-token run => must share >= 1 fp
    k, w = 4, 5
    run = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 = w+k-1
    a = "one two three " + run + " x1 y1 z1"
    b = "nine eight seven six " + run + " q2 r2"
    df = spark.createDataFrame(
        [(10, a), (20, b)], "doc_id long, text string"
    )
    pairs = winnow_candidate_pairs(df, k=k, w=w, max_df=None).collect()
    assert len(pairs) == 1
    assert (pairs[0]["id_l"], pairs[0]["id_r"]) == (10, 20)
    assert pairs[0]["n_shared"] >= 1


def test_max_df_drops_boilerplate(spark):
    footer = "copyright acme corp all rights reserved contact us today"
    rows = [(i, f"unique{i} body{i} " + footer) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    allp = winnow_candidate_pairs(df, k=3, w=3, max_df=None).count()
    assert allp == 15  # all C(6,2) pairs via the shared footer
    capped = winnow_candidate_pairs(df, k=3, w=3, max_df=5).count()
    assert capped < allp  # fps selected by all 6 docs are dropped
    # max_df=1 keeps only single-doc fingerprints => no pairs at all
    assert winnow_candidate_pairs(df, k=3, w=3, max_df=1).count() == 0


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, w=0)


# -- property coverage of the algorithm semantics (pure Python mirror,
#    no JVM per example; Spark parity is pinned by
#    test_matches_python_reference above) ------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_tok = st.text(
    alphabet=st.characters(min_codepoint=ord("a"), max_codepoint=ord("z")),
    min_size=1,
    max_size=5,
)
_doc = st.lists(_tok, min_size=0, max_size=30)


@settings(max_examples=150, deadline=None)
@given(_doc, _doc, st.lists(_tok, min_size=8, max_size=8))
def test_property_shared_run_guarantee(prefix_a, prefix_b, run):
    """Planting the same (w + k - 1)-token run in two documents always
    yields >= 1 shared fingerprint (k=4, w=5)."""
    k, w = 4, 5
    a = " ".join(prefix_a + run)
    b = " ".join(prefix_b + run)
    fa = {fp for _, fp in _py_winnow(a, k, w)}
    fb = {fp for _, fp in _py_winnow(b, k, w)}
    assert fa & fb


@settings(max_examples=150, deadline=None)
@given(st.lists(_tok, min_size=8, max_size=40))
def test_property_every_window_covered(toks):
    """Winnowing's coverage invariant: each w-window of the k-gram
    sequence contains at least one selected position (k=3, w=4)."""
    k, w = 3, 4
    sel = {pos for pos, _ in _py_winnow(" ".join(toks), k, w)}
    n_hashes = len(toks) - k + 1
    for start in range(n_hashes - w + 1):
        assert any(start <= p < start + w for p in sel)
