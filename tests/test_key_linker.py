"""KeyLinker semantics (mismo/linker/tests/test_key_linker.py:40-77)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mismo_spark import EmptyLinker, FullLinker, KeyLinker, UnnestLinker
from tests.conftest import assert_df_equal


def links_set(linkage):
    return {
        (r["record_id_l"], r["record_id_r"])
        for r in linkage.links.select("record_id_l", "record_id_r").collect()
    }


def test_single_key_link(t1, t2):
    lk = KeyLinker(["letter"])(t1, t2)
    assert links_set(lk) == {(1, 90), (2, 91)}


def test_single_key_dedupe(counts_records):
    lk = KeyLinker(["letter"], task="dedupe")(counts_records)
    # b: {2,3,5}; c: {4,6,8}; a: singleton; null never matches
    assert links_set(lk) == {(2, 3), (2, 5), (3, 5), (4, 6), (4, 8), (6, 8)}


def test_two_keys_dedupe(counts_records):
    lk = KeyLinker(["letter", "num"], task="dedupe")(counts_records)
    assert links_set(lk) == {(2, 3), (4, 6), (4, 8), (6, 8)}


def test_column_expression_key(t1, t2):
    lk = KeyLinker([lambda df: df["int"] + 1])(t1, t2)
    # t1.int+1 = 2,3,4 ; t2.int+1 = 3,5,null,7
    assert links_set(lk) == {(1, 90)}


def test_left_right_tuple_key(t1, t2):
    lk = KeyLinker([("letter", "letter")])(t1, t2)
    assert links_set(lk) == {(1, 90), (2, 91)}


def test_max_pairs_removes_skewed_key(counts_records):
    # keys (c,3) → 3 dedupe pairs > budget 2 → dropped; (b,1) → 1 pair kept
    lk = KeyLinker(["letter", "num"], task="dedupe", max_pairs=2)(counts_records)
    assert links_set(lk) == {(2, 3)}
    # budget 0 drops every pair-generating key
    lk0 = KeyLinker(["letter"], task="dedupe", max_pairs=0)(counts_records)
    assert links_set(lk0) == set()


def test_null_keys_never_match(t1, t2):
    lk = KeyLinker(["int"])(t1, t2)
    # t2 has int=null on 92 — must not match anything
    assert links_set(lk) == {(1, 90)}


def test_full_linker(t1, t2):
    lk = FullLinker()(t1, t2)
    assert len(links_set(lk)) == 12


def test_full_linker_dedupe(t1):
    lk = FullLinker(task="dedupe")(t1, t1)
    assert links_set(lk) == {(0, 1), (0, 2), (1, 2)}


def test_empty_linker(t1, t2):
    lk = EmptyLinker()(t1, t2)
    assert links_set(lk) == set()
    assert lk.links.columns == ["record_id_l", "record_id_r"]


def test_unnest_linker(t1, t2):
    lk = UnnestLinker("array")(t1, t2)
    # t1: 0→[a,b], 1→[b], 2→[]; t2: 90→[b], 91→[c], 92→[d], 93→null
    assert links_set(lk) == {(0, 90), (1, 90)}


def test_unnest_linker_dedupe(t1):
    lk = UnnestLinker("array", task="dedupe")(t1, t1)
    assert links_set(lk) == {(0, 1)}


def test_key_counts(counts_records):
    kc = KeyLinker(["letter"]).key_counts(counts_records)
    assert_df_equal(kc, [("b", 3), ("c", 3), ("a", 1)])


def test_pair_counts_dedupe(counts_records):
    pc = KeyLinker(["letter"]).pair_counts(counts_records, task="dedupe")
    assert_df_equal(pc, [("b", 3), ("c", 3), ("a", 0)])


def test_pair_counts_link(counts_records):
    pc = KeyLinker(["letter"]).pair_counts(counts_records, counts_records, task="link")
    assert_df_equal(pc, [("b", 9), ("c", 9), ("a", 1)])


def test_pair_counts_two_keys(counts_records):
    lk = KeyLinker(["letter", "num"])
    dd = lk.pair_counts(counts_records, task="dedupe")
    assert_df_equal(dd, [("c", 3, 3), ("b", 1, 1), ("a", 1, 0), ("b", 2, 0)])
    ln = lk.pair_counts(counts_records, counts_records, task="link")
    assert_df_equal(ln, [("c", 3, 9), ("b", 1, 4), ("a", 1, 1), ("b", 2, 1)])
