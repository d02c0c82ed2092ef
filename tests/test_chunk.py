"""Chunking + sequence packing: golden window arithmetic vs a Python
reference, overlap semantics, empty docs, packing determinism and the
start-bin overflow contract."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mismo_spark.chunk import chunk_documents, pack_sequences


def _py_chunks(text, c, o):
    toks = text.split()
    if not toks:
        return []
    step = c - o
    out = []
    i = 0
    cid = 0
    n = len(toks)
    n_chunks = 1 if n <= c else 1 + -(-(n - c) // step)
    for cid in range(n_chunks):
        start = cid * step
        w = toks[start:start + c]
        out.append((cid, start, len(w), " ".join(w)))
    return out


@pytest.mark.parametrize("c,o", [(4, 0), (4, 2), (5, 1), (3, 2)])
def test_chunk_documents_matches_python(spark, c, o):
    texts = [
        (0, "a b c d e f g h i j"),
        (1, "one two three"),
        (2, "x"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {}
    for r in chunk_documents(df, chunk_tokens=c, overlap_tokens=o).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_token"], r["n_tokens"], r["chunk_text"])
        )
    for did, text in texts:
        exp = _py_chunks(text, c, o) if text else []
        assert sorted(got.get(did, [])) == exp, (did, c, o)


def test_chunk_reconstruction_no_overlap(spark):
    """With overlap 0 the chunks concatenate back to the document."""
    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(23)))], "doc_id long, text string"
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=5).collect(),
        key=lambda r: r["chunk_id"],
    )
    assert " ".join(r["chunk_text"] for r in rows).split() == [
        f"t{i}" for i in range(23)
    ]
    assert [r["start_token"] for r in rows] == [0, 5, 10, 15, 20]


def test_chunk_validation(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="chunk_tokens"):
        chunk_documents(df, chunk_tokens=0)
    with pytest.raises(ValueError, match="overlap_tokens"):
        chunk_documents(df, chunk_tokens=3, overlap_tokens=3)


def test_pack_sequences(spark):
    rows = [(i, 40) for i in range(20)]  # 20 docs x 40 tokens
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = pack_sequences(df, seq_tokens=100).collect()
    assert len(out) == 20
    # python replay of the md5 layout
    order = sorted(
        range(20), key=lambda i: hashlib.md5(f"{i}|42".encode()).hexdigest()
    )
    before = 0
    exp = {}
    for i in order:
        exp[i] = (before // 100, before % 100)
        before += 40
    got = {r["doc_id"]: (r["seq_id"], r["seq_offset"]) for r in out}
    assert got == exp
    # start-bin contract: every sequence holds >= 1 document and ids
    # are dense from 0
    seqs = sorted({s for s, _ in got.values()})
    assert seqs == list(range(seqs[-1] + 1))
    # determinism
    out2 = {r["doc_id"]: (r["seq_id"], r["seq_offset"])
            for r in pack_sequences(df, seq_tokens=100).collect()}
    assert out2 == got


def test_pack_sequences_by_group(spark):
    rows = [(i, 30, "train" if i % 2 == 0 else "test") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, split string")
    out = pack_sequences(df, seq_tokens=60, by=["split"]).collect()
    # groups never share a sequence layout: offsets restart per group
    for split in ("train", "test"):
        grp = [r for r in out if r["split"] == split]
        assert min(r["seq_offset"] for r in grp) == 0
    with pytest.raises(ValueError, match="seq_tokens"):
        pack_sequences(df, seq_tokens=0)
