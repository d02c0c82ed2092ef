"""Duplicated-token-span detection / stats / removal (ExactSubstr-style)."""

from __future__ import annotations

import pytest

from mismo_spark.textqa.spans import (
    duplicated_span_stats,
    duplicated_token_spans,
    remove_duplicated_spans,
)

BOILER = "all rights reserved contact us today"
DOCS = [
    (0, f"alpha beta gamma {BOILER} delta epsilon"),
    (1, f"one two three four {BOILER}"),
    (2, "totally unique text with no repeats anywhere at all"),
    (3, f"{BOILER} {BOILER} tail"),          # within-doc repeat
    (4, "short"),                              # < n tokens: no windows
]
N = 3  # token window


def _brute_spans(texts, n=N, min_count=2):
    toks = {i: t.lower().split() for i, t in texts}
    grams = {}
    for i, tk in toks.items():
        for p in range(len(tk) - n + 1):
            grams.setdefault(" ".join(tk[p : p + n]), []).append((i, p))
    marks = {}
    for g, occ in grams.items():
        if len(occ) >= min_count:
            for i, p in occ:
                marks.setdefault(i, set()).update(range(p, p + n))
    spans = {}
    for i, pos in marks.items():
        merged, cur = [], None
        for p in sorted(pos):
            if cur and p <= cur[1] + 1:
                cur[1] = p
            else:
                cur = [p, p]
                merged.append(cur)
        spans[i] = [(a, b) for a, b in merged]
    return toks, spans


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_spans_match_brute_force(spark):
    toks, want = _brute_spans(DOCS)
    got = {}
    for r in duplicated_token_spans(_df(spark), n=N).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
        assert r["span_tokens"] == r["span_end"] - r["span_start"] + 1
    assert {k: sorted(v) for k, v in got.items()} == want


def test_span_stats_fraction(spark):
    toks, want = _brute_spans(DOCS)
    rows = {r["doc_id"]: r for r in duplicated_span_stats(_df(spark), n=N).collect()}
    assert set(rows) == {i for i, _ in DOCS}
    for i, tk in toks.items():
        r = rows[i]
        dup = sum(b - a + 1 for a, b in want.get(i, []))
        assert r["n_tokens"] == len(tk)
        assert r["n_spans"] == len(want.get(i, []))
        assert r["dup_tokens"] == dup
        assert r["dup_token_frac"] == pytest.approx(dup / len(tk), abs=1e-6)


def test_remove_duplicated_spans(spark):
    toks, want = _brute_spans(DOCS)
    out = {
        r["doc_id"]: r["text_deduped"]
        for r in remove_duplicated_spans(_df(spark), n=N).collect()
    }
    for i, tk in toks.items():
        cut = {p for a, b in want.get(i, []) for p in range(a, b + 1)}
        expect = " ".join(t for p, t in enumerate(tk) if p not in cut)
        assert out[i] == expect
    # the boilerplate really is gone
    assert BOILER not in out[0] and BOILER not in out[3]
    # unique text survives verbatim (modulo lowercase/whitespace fold)
    assert out[2] == DOCS[2][1]


def test_spans_validate_params(spark):
    with pytest.raises(ValueError):
        duplicated_token_spans(_df(spark), n=0)
    with pytest.raises(ValueError):
        duplicated_token_spans(_df(spark), min_count=1)
