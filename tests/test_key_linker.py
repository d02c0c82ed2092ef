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


# ---- skew_split: salted hot-key tiling must be row-identical ----------


def _skewed_records(spark, n_hot=120, n_cold=40):
    """One hot key ('hot') with n_hot rows + scattered cold keys."""
    rows = [(i, "hot") for i in range(n_hot)]
    rows += [(1000 + i, f"cold{i % 13}") for i in range(n_cold)]
    return spark.createDataFrame(rows, "record_id long, letter string")


def test_skew_split_dedupe_identical(spark):
    recs = _skewed_records(spark)
    plain = KeyLinker(["letter"], task="dedupe")(recs)
    salted = KeyLinker(["letter"], task="dedupe", skew_split=100)(recs)
    assert links_set(salted) == links_set(plain)
    # hot key alone contributes 120*119/2 = 7140 pairs
    assert len(links_set(salted)) > 7000


def test_skew_split_link_identical(spark):
    left = _skewed_records(spark, n_hot=80, n_cold=30)
    right = _skewed_records(spark, n_hot=50, n_cold=20).withColumn(
        "record_id", F.col("record_id") + 100000
    )
    plain = KeyLinker(["letter"], task="link")(left, right)
    salted = KeyLinker(["letter"], task="link", skew_split=200)(left, right)
    assert links_set(salted) == links_set(plain)
    assert len(links_set(salted)) >= 80 * 50


def test_skew_split_no_hot_keys_is_plain(spark):
    """Budget above every key's pair count -> pure cold path, identical."""
    recs = _skewed_records(spark, n_hot=10, n_cold=40)
    plain = KeyLinker(["letter"], task="dedupe")(recs)
    salted = KeyLinker(["letter"], task="dedupe", skew_split=10_000_000)(recs)
    assert links_set(salted) == links_set(plain)


def test_skew_split_composes_with_max_pairs(spark):
    """max_pairs drops the mega-key first; skew_split tiles the rest."""
    rows = [(i, "mega") for i in range(200)]          # 19900 pairs: dropped
    rows += [(10_000 + i, "hot") for i in range(60)]  # 1770 pairs: tiled
    rows += [(20_000 + i, f"c{i}") for i in range(10)]
    recs = spark.createDataFrame(rows, "record_id long, letter string")
    got = KeyLinker(
        ["letter"], task="dedupe", max_pairs=10_000, skew_split=500
    )(recs)
    expect = KeyLinker(["letter"], task="dedupe", max_pairs=10_000)(recs)
    assert links_set(got) == links_set(expect)
    assert len(links_set(got)) == 60 * 59 // 2


def test_skew_split_no_duplicate_pairs(spark):
    """Tiling must emit each unordered pair exactly once (count == set)."""
    recs = _skewed_records(spark, n_hot=90, n_cold=25)
    links = KeyLinker(["letter"], task="dedupe", skew_split=50)(recs).links
    assert links.count() == links.distinct().count()
    ordered = links.filter(F.col("record_id_l") >= F.col("record_id_r"))
    assert ordered.count() == 0


def test_skew_split_plan_shape(spark):
    """The salted plan must (a) broadcast the hot-key table (never
    shuffle record rows to find their salt), and (b) tile via explode —
    the hot key's pairs are generated across many (key, tile) groups
    instead of one hash partition."""
    recs = _skewed_records(spark)
    links = KeyLinker(["letter"], task="dedupe", skew_split=100)(recs).links
    plan = links._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    # cold path separation happens with broadcast anti-joins
    assert "LeftAnti, BuildRight" in plan, plan


def test_counts_table_wrapper(spark):
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.types.counts_table import (
        CountsTable,
        KeyCountsTable,
        PairCountsTable,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b")], "record_id long, k string"
    )
    lk = KeyLinker(["k"], task="dedupe")
    kc = lk.key_counts(df)
    assert isinstance(kc, KeyCountsTable) and isinstance(kc, CountsTable)
    # still a full DataFrame: chainable ops work
    assert kc.filter(F.col("n") > 1).count() == 1
    assert kc.n_total() == 4
    assert kc.n_total() == 4  # memoized path
    pc = lk.pair_counts(df)
    assert isinstance(pc, PairCountsTable)
    assert pc.n_total() == 3  # C(3,2) + C(1,2)
