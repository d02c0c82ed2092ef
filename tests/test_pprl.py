"""CLK Bloom encoding + Dice (lib/pprl.py) — Schnell et al. semantics:
similar names → similar bit patterns, packed and set forms agree, and
the md5 position hash replays in DuckDB."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mismo_spark.lib.pprl import (
    clk_pack,
    clk_positions,
    dice_packed,
    dice_positions,
)


def enc(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "a string, b string")
    return df.select(
        dice_positions(
            clk_positions(F.col("a"), **kw), clk_positions(F.col("b"), **kw)
        ).alias("dice")
    ).collect()


def test_similar_names_score_higher(spark):
    rows = enc(
        spark,
        [("john smith", "jon smith"), ("john smith", "maria garcia")],
    )
    assert rows[0].dice > 0.7
    assert rows[1].dice < 0.4
    assert rows[0].dice > rows[1].dice


def test_identical_is_one_and_case_insensitive(spark):
    rows = enc(spark, [("John  Smith", "john  smith")])
    assert rows[0].dice == 1.0


def test_null_and_empty(spark):
    df = spark.createDataFrame([(None, "x")], "a string, b string")
    got = df.select(
        F.size(clk_positions(F.col("a"))).alias("na"),
        dice_positions(
            clk_positions(F.col("a")), clk_positions(F.col("a"))
        ).alias("d"),
    ).collect()[0]
    assert got.na == 0 and got.d == 0.0


def test_multi_column_clk_unions_fields(spark):
    df = spark.createDataFrame([("ann", "lee")], "a string, b string")
    got = df.select(
        F.size(clk_positions(F.col("a"))).alias("sa"),
        F.size(clk_positions(F.col("b"))).alias("sb"),
        F.size(clk_positions(F.col("a"), F.col("b"))).alias("sab"),
        dice_positions(
            clk_positions(F.col("a"), F.col("b")),
            clk_positions(F.col("a")),
        ).alias("partial"),
    ).collect()[0]
    assert got.sab <= got.sa + got.sb
    assert got.sab > max(got.sa, got.sb)
    assert 0.0 < got.partial < 1.0


def test_packed_dice_equals_set_dice(spark):
    names = [
        ("john smith", "jon smith"),
        ("maria garcia", "mario garcia"),
        ("x", "completely different"),
        ("same", "same"),
    ]
    df = spark.createDataFrame(names, "a string, b string")
    pa = clk_positions(F.col("a"), n_bits=256, n_hashes=3)
    pb = clk_positions(F.col("b"), n_bits=256, n_hashes=3)
    got = df.select(
        dice_positions(pa, pb).alias("s"),
        dice_packed(
            clk_pack(pa, n_bits=256), clk_pack(pb, n_bits=256)
        ).alias("p"),
    ).collect()
    for r in got:
        assert abs(r.s - r.p) < 1e-12


def test_positions_replay_in_duckdb(spark):
    name = "john smith"
    df = spark.createDataFrame([(name,)], "a string")
    got = df.select(clk_positions(F.col("a")).alias("p")).collect()[0].p
    sql = """
      WITH s AS (SELECT '_' || lower(trim($1::VARCHAR)) || '_' AS t),
      grams AS (
        SELECT list_distinct(
          list_transform(range(1, length(t)), i -> substring(t, i, 2))
        ) AS gs FROM s
      )
      SELECT list_sort(list_distinct(flatten(list_transform(gs,
        g -> [
          (('0x' || substr(md5(g || ':42:0'), 1, 8))::BIGINT % 1024),
          (('0x' || substr(md5(g || ':42:1'), 1, 8))::BIGINT % 1024)
        ])))) FROM grams
    """
    want = duckdb.connect().execute(sql, [name]).fetchone()[0]
    assert got == want


def test_bad_params_raise(spark):
    import pytest

    with pytest.raises(ValueError, match="n_bits"):
        clk_positions(F.lit("x"), n_bits=100)
    with pytest.raises(ValueError, match="n_hashes"):
        clk_positions(F.lit("x"), n_hashes=0)


def test_clk_packed_words_matches_hof_encoder(spark):
    """The relational (explode + bit_or) encoder must produce exactly
    clk_pack(clk_positions(...)) word-for-word, with n = |position set|
    — including NULL identifiers and empty strings."""
    from mismo_spark.lib.pprl import clk_packed_words

    rows = [
        (1, "john smith", "BUILDING"),
        (2, "jon smith", "AUTOMOBILE"),
        (3, None, "MACHINERY"),
        (4, "", ""),
        (5, None, None),
        (6, "Ünïcode Näme", "household"),
        (7, "a", "b"),
    ]
    df = spark.createDataFrame(rows, "id long, name string, seg string")
    ref = df.select(
        "id",
        clk_pack(clk_positions(F.col("name"), F.col("seg"))).alias("bits"),
        F.size(clk_positions(F.col("name"), F.col("seg"))).alias("n"),
    ).collect()
    got = clk_packed_words(df, ["id"], ["name", "seg"]).collect()
    ref_by_id = {r.id: r for r in ref}
    assert len(got) == len(rows)
    for g in got:
        r = ref_by_id[g.id]
        words = [g[f"w{i}"] for i in range(16)]
        assert words == list(r.bits), g.id
        assert g.n == r.n, g.id
