"""lib modules: email/phone/geo/name + arrays + tf + diff + structs +
re_extract + IDLinker."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mismo_spark.arrays import (
    array_all,
    array_any,
    array_choice_seeded,
    array_combinations,
    array_filter_isin_other,
    array_mean,
    array_median,
    array_shuffle_seeded,
    array_sort_by,
    array_sum,
)
from mismo_spark.lib.email import clean_email, match_level, parse_email
from mismo_spark.lib.geo import CoordinateLinker, bin_lat_lon, distance_km
from mismo_spark.lib.name import name_tokens, normalize_name, with_nickname_match
from mismo_spark.lib.phone import clean_phone_number
from mismo_spark.linker.id import IDLinker
from mismo_spark.structs import struct_equal, struct_isnull, struct_mutate
from mismo_spark.text.re_extract import re_extract_struct
from mismo_spark.tf import add_frequencies, ambiguous_haystack_filter, value_stats
from mismo_spark.types.diff import Diff, diff_tables, value_change


def vals(spark, data, schema, col):
    df = spark.createDataFrame(data, schema)
    return [r["v"] for r in df.select(col(df).alias("v")).collect()]


# ---- email (FIXTURES.md F8, mismo/lib/email/_core.py) -------------------


def test_clean_email(spark):
    out = vals(
        spark,
        [("Bob.Smith@GMAIL.com",), ("no email here",), ("x y@z.com tail",)],
        "e string",
        lambda df: clean_email(df["e"]),
    )
    assert out[0] == "bob.smith@gmail.com"
    assert out[1] is None
    assert out[2] == "y@z.com"


def test_clean_email_normalize(spark):
    out = vals(
        spark,
        [("Bob.Smith@GMAIL.com",), ("a_b.c@d_e.f",)],
        "e string",
        lambda df: clean_email(df["e"], normalize=True),
    )
    assert out[0] == "bobsmith@gmailcom"
    assert out[1] == "abc@def"


def test_email_match_level(spark):
    df = spark.createDataFrame(
        [
            ("bob@x.com", "BOB@x.com"),     # FULL_EXACT after normalize
            ("bob@x.com", "bob@x.co"),       # FULL_NEAR (dl 1)
            ("bob@x.com", "bob@zzz.org"),    # USER_EXACT
            ("bob@x.com", "bub@zzz.org"),    # USER_NEAR
            ("bob@x.com", "alice@zzz.org"),  # ELSE
        ],
        "a string, b string",
    )
    out = [r["v"] for r in df.select(match_level(df["a"], df["b"]).alias("v")).collect()]
    assert out == [0, 1, 2, 3, 4]


# ---- phone (mismo/lib/phone/_core.py:31-82) ------------------------------


def test_clean_phone_number(spark):
    cases = [
        ("(312) 555-6789", "3125556789"),
        ("1-312-555-6789", "3125556789"),
        ("13125556789", "3125556789"),
        ("555-6789", None),  # 7 digits, no default area code
        ("0000000000", None),  # bogus
        ("3125550000", None),  # contains 0000
        ("", None),
        ("hello", None),
    ]
    out = vals(spark, [(c[0],) for c in cases], "p string", lambda df: clean_phone_number(df["p"]))
    assert out == [c[1] for c in cases]


def test_clean_phone_default_area_code(spark):
    out = vals(
        spark,
        [("555-6789",)],
        "p string",
        lambda df: clean_phone_number(df["p"], default_area_code="312"),
    )
    assert out == ["3125556789"]


# ---- geo (mismo/lib/geo/_latlon.py) --------------------------------------


def test_distance_km(spark):
    # NYC → LA ≈ 3936 km
    df = spark.createDataFrame([(40.7128, -74.0060, 34.0522, -118.2437)], "a double, b double, c double, d double")
    out = df.select(
        distance_km(lat1=df["a"], lon1=df["b"], lat2=df["c"], lon2=df["d"]).alias("v")
    ).collect()[0]["v"]
    assert out == pytest.approx(3936, rel=0.01)


def test_coordinate_linker(spark):
    recs = spark.createDataFrame(
        [
            (1, 40.0, -74.0),
            (2, 40.001, -74.001),  # ~0.14 km from 1
            (3, 41.5, -74.0),      # ~167 km away
        ],
        "record_id long, lat double, lon double",
    )
    lk = CoordinateLinker(distance_km=5, task="dedupe")(recs)
    got = {(r["record_id_l"], r["record_id_r"]) for r in lk.links.collect()}
    assert got == {(1, 2)}


# ---- name ----------------------------------------------------------------


def test_normalize_name_and_tokens(spark):
    df = spark.createDataFrame([("José  van-Dyke",)], "n string")
    out = df.select(
        normalize_name(df["n"]).alias("norm"),
        name_tokens(df["n"]).alias("toks"),
    ).collect()[0]
    assert out["norm"] == "JOSE VANDYKE"
    assert out["toks"] == ["JOSE", "VANDYKE"]


def test_nickname_match(spark):
    df = spark.createDataFrame(
        [("William", "Bill"), ("Bill", "William"), ("William", "Sue")],
        "a string, b string",
    )
    out = [r["is_nickname_match"] for r in with_nickname_match(df, "a", "b").orderBy("b").collect()]
    # ordered by b: Bill, Sue, William
    assert out == [True, False, True]


def test_is_nickname_for_directional(spark):
    from mismo_spark.lib.name import is_nickname_for

    df = spark.createDataFrame(
        [
            ("Bill", "William"),   # nick → canonical: True
            ("William", "Bill"),   # reversed: False (directional)
            ("sue", "sue"),        # equal: True
            ("Sue", "William"),    # unrelated: False
        ],
        "nick string, canon string",
    )
    out = [
        r["hit"]
        for r in df.select(
            is_nickname_for(df["nick"], df["canon"]).alias("hit")
        ).collect()
    ]
    assert out == [True, False, True, False]


def test_name_dimension_pipeline(spark):
    from mismo_spark.lib.name import NameDimension, NameMatchLevel

    def name(given, surname, nickname=None):
        return (None, given, None, surname, None, nickname)

    schema = (
        "record_id long, name struct<prefix:string,given:string,"
        "middle:string,surname:string,suffix:string,nickname:string>"
    )
    df = spark.createDataFrame(
        [
            (1, name("José", "van-Dyke")),
            (2, name("Bill", "Smith")),
            (3, name("William", "Smith")),
        ],
        schema,
    )
    dim = NameDimension("name")
    prepped = dim.prepare_for_blocking(dim.prepare_for_fast_linking(df))
    rows = {r["record_id"]: r for r in prepped.collect()}
    assert rows[1]["name_normed"]["given"] == "JOSE"
    assert rows[1]["name_normed"]["surname"] == "VANDYKE"
    assert set(rows[1]["name_tokens"]) == {"JOSE", "VANDYKE"}
    # compare: nickname pair (Bill, William) with equal surname
    pairs = (
        prepped.select(
            F.col("record_id").alias("record_id_l"),
            F.col("name_normed").alias("name_normed_l"),
        )
        .crossJoin(
            prepped.select(
                F.col("record_id").alias("record_id_r"),
                F.col("name_normed").alias("name_normed_r"),
            )
        )
        .filter(F.col("record_id_l") < F.col("record_id_r"))
    )
    compared = {
        (r["record_id_l"], r["record_id_r"]): r["name_compared"]
        for r in dim.compare(pairs).collect()
    }
    assert compared[(2, 3)] == int(NameMatchLevel.NICKNAMES)
    assert compared[(1, 2)] == int(NameMatchLevel.ELSE)


# ---- arrays ----------------------------------------------------------------


def test_array_functions(spark):
    df = spark.createDataFrame([([3.0, 1.0, 2.0],)], "a array<double>")
    row = df.select(
        array_sum(df["a"]).alias("s"),
        array_mean(df["a"]).alias("m"),
        array_median(df["a"]).alias("md"),
        array_shuffle_seeded(df["a"]).alias("sh"),
        array_choice_seeded(df["a"], 2).alias("ch"),
        array_sort_by(df["a"], lambda x: -x).alias("desc"),
        array_combinations(F.array(F.lit("x")), F.array(F.lit("y"), F.lit("z"))).alias("combos"),
    ).collect()[0]
    assert row["s"] == 6.0
    assert row["m"] == 2.0
    assert row["md"] == 2.0
    assert sorted(row["sh"]) == [1.0, 2.0, 3.0]
    assert len(row["ch"]) == 2
    assert row["desc"] == [3.0, 2.0, 1.0]
    assert [(c["l"], c["r"]) for c in row["combos"]] == [("x", "y"), ("x", "z")]


def test_array_any_all_even_median(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0, 4.0], [True, False])], "a array<double>, b array<boolean>")
    row = df.select(
        array_median(df["a"]).alias("md"),
        array_any(df["b"]).alias("any"),
        array_all(df["b"]).alias("all"),
    ).collect()[0]
    assert row["md"] == 2.5
    assert row["any"] is True
    assert row["all"] is False


def test_array_filter_isin_other(spark):
    df = spark.createDataFrame(
        [(1, ["a", "b", "c"]), (2, ["x"]), (3, None)],
        "record_id long, arr array<string>",
    )
    other = spark.createDataFrame([("b",), ("c",), ("q",)], "keep string")
    out = array_filter_isin_other(df, "arr", other, "keep")
    got = {r["record_id"]: r["filtered"] for r in out.collect()}
    assert got[1] == ["b", "c"]  # order preserved
    assert got[2] == []
    assert got[3] == []


# ---- tf --------------------------------------------------------------------


def test_value_stats_and_frequencies(spark):
    df = spark.createDataFrame([("a",), ("a",), ("b",), (None,)], "v string")
    stats = {r["value"]: (r["n"], r["frequency"]) for r in value_stats(df, "v").collect()}
    assert stats["a"] == (2, 0.5)
    withf = add_frequencies(df, "v")
    got = {(r["v"], round(r["v_frequency"], 3)) for r in withf.collect()}
    assert (None, 0.25) in got  # null → 1/N default
    assert ("a", 0.5) in got


def test_ambiguous_haystack_filter(spark):
    df = spark.createDataFrame([(1, "k1"), (2, "k1"), (3, "k2")], "record_id long, k string")
    out = {r["record_id"] for r in ambiguous_haystack_filter(df, ["k"]).collect()}
    assert out == {3}


# ---- diff ------------------------------------------------------------------


def test_diff_tables(spark, tmp_path):
    before = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None)],
        "id long, s string, n long",
    )
    after = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, "d", 40)],
        "id long, s string, n long",
    )
    d = diff_tables(before, after, "id")
    assert {r["id"] for r in d.insertions.collect()} == {4}
    assert {r["id"] for r in d.deletions.collect()} == {3}
    ups = d.updates.collect()
    assert [r["id"] for r in ups] == [2]
    changes = d.updates.select(
        value_change(F.col("s")).alias("cs"), value_change(F.col("n")).alias("cn")
    ).collect()[0]
    assert changes["cs"] == "changed"
    assert changes["cn"] == "unchanged"
    assert {r["id"] for r in d.unchanged.collect()} == {1}
    stats = d.stats()
    assert stats.n_insertions() == 1
    assert stats.n_deletions() == 1
    assert stats.n_updates() == 1
    assert stats.n_unchanged() == 1
    assert stats.n_before() == 3
    assert stats.n_after() == 3
    assert "before=3" in repr(stats)
    d.to_parquets(str(tmp_path / "diff"))
    d2 = Diff.from_parquets(spark, str(tmp_path / "diff"))
    assert d2.insertions.count() == 1
    assert d2.unchanged is not None and d2.unchanged.count() == 1
    assert d2.stats().n_after() == 3


def test_remove_condition_overlap(spark):
    from mismo_spark.linker.base import remove_condition_overlap

    df = spark.createDataFrame(
        [(1, 1), (2, 4), (3, 9), (4, 16)], "x long, y long"
    )
    conds = remove_condition_overlap(
        [F.col("x") <= 2, F.col("y") <= 9, True]
    )
    # disjoint branches partition the rows exactly once each
    sizes = [df.filter(c).count() for c in conds]
    assert sizes == [2, 1, 1]
    assert sum(sizes) == df.count()
    # bool literals accepted like the reference's ibis.literal path
    only_true = remove_condition_overlap([False, True])
    assert df.filter(only_true[1]).count() == df.count()


# ---- structs / re_extract / IDLinker ---------------------------------------


def test_struct_ops(spark):
    df = spark.createDataFrame([((1, "x"), (1, "y"))], "a struct<p:long,q:string>, b struct<p:long,q:string>")
    row = df.select(
        struct_equal(df["a"], df["b"], ["p", "q"]).alias("eq"),
        struct_equal(df["a"], df["a"], ["p", "q"]).alias("eq_self"),
        struct_isnull(df["a"], ["p", "q"], how="any").alias("nl"),
        struct_mutate(df["a"], ["p", "q"], q=F.lit("z")).alias("mut"),
    ).collect()[0]
    assert row["eq"] is False
    assert row["eq_self"] is True
    assert row["nl"] is False
    assert row["mut"]["q"] == "z"


def test_re_extract_struct(spark):
    df = spark.createDataFrame([("a-12",), ("zzz",)], "s string")
    out = [
        r["v"]
        for r in df.select(
            re_extract_struct(df["s"], r"(?P<word>[a-z]+)-(?P<num>\d+)").alias("v")
        ).collect()
    ]
    assert out[0]["word"] == "a" and out[0]["num"] == "12"
    assert out[1]["word"] == "" and out[1]["num"] == ""


def test_id_linker(spark):
    recs = spark.createDataFrame(
        [(1, "ssn1"), (2, "ssn1"), (3, "ssn2"), (4, None)],
        "record_id long, ssn string",
    )
    lk = IDLinker("ssn", task="dedupe")(recs)
    got = {(r["record_id_l"], r["record_id_r"]) for r in lk.links.collect()}
    assert got == {(1, 2)}


def test_id_linker_indefinite_three_way_split(spark):
    """The three pair classes partition all pairs: matches ∪ nonmatches
    ∪ indefinite, per policy (mismo/linker/_id_linker.py:116-118 — NIE
    there; implemented here)."""
    recs = spark.createDataFrame(
        [(1, "ssn1"), (2, "ssn1"), (3, "ssn2"), (4, None)],
        "record_id long, ssn string",
    )

    def pairs_of(linkage):
        return {(r["record_id_l"], r["record_id_r"]) for r in linkage.links.collect()}

    # unequal ids indefinite, nulls nonmatch
    lk = IDLinker("ssn", when_not_equal="indefinite", task="dedupe")
    assert pairs_of(lk(recs)) == {(1, 2)}
    assert pairs_of(lk.indefinite_linkage(recs)) == {(1, 3), (2, 3)}

    # nulls indefinite, unequal nonmatch
    lk = IDLinker("ssn", when_null="indefinite", task="dedupe")
    assert pairs_of(lk.indefinite_linkage(recs)) == {(1, 4), (2, 4), (3, 4)}

    # both indefinite: every non-match pair is indefinite
    lk = IDLinker("ssn", when_null="indefinite", when_not_equal="indefinite", task="dedupe")
    assert pairs_of(lk.indefinite_linkage(recs)) == {
        (1, 3), (2, 3), (1, 4), (2, 4), (3, 4),
    }

    # both nonmatch: nothing is indefinite (typed empty links)
    lk = IDLinker("ssn", task="dedupe")
    empty = lk.indefinite_linkage(recs)
    assert empty.links.count() == 0
    assert set(empty.links.columns) == {"record_id_l", "record_id_r"}

    # condition form (the scale path) agrees with the materialized form
    lk = IDLinker("ssn", when_not_equal="indefinite", task="dedupe")
    from pyspark.sql import functions as F

    cand = (
        recs.select(F.col("record_id").alias("record_id_l"), F.col("ssn").alias("ssn_l"))
        .crossJoin(
            recs.select(F.col("record_id").alias("record_id_r"), F.col("ssn").alias("ssn_r"))
        )
        .filter(F.col("record_id_l") < F.col("record_id_r"))
    )
    cond = lk.indefinite_condition(F.col("ssn_l"), F.col("ssn_r"))
    got = {
        (r["record_id_l"], r["record_id_r"])
        for r in cand.filter(cond).select("record_id_l", "record_id_r").collect()
    }
    assert got == {(1, 3), (2, 3)}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        IDLinker("ssn", when_null="maybe")


def test_bundled_nickname_table(spark):
    """The bundled CSV (lib/data/nicknames.csv) is the default source:
    several hundred pairs, normalized-uppercase, loadable through
    nickname_pairs, and NameComparer-visible (e.g. PEGGY~MARGARET)."""
    from mismo_spark.lib.name import load_nickname_pairs, nickname_pairs

    pairs = load_nickname_pairs(None)
    assert len(pairs) >= 300
    assert ("MARGARET", "PEGGY") in pairs
    assert ("EDWARD", "TED") in pairs
    df = spark.createDataFrame(
        [("Peggy", "Margaret"), ("Ted", "Edward"), ("Ted", "Margaret")],
        "a string, b string",
    )
    out = {
        (r["a"], r["b"]): r["is_nickname_match"]
        for r in with_nickname_match(df, "a", "b").collect()
    }
    assert out == {
        ("Peggy", "Margaret"): True,
        ("Ted", "Edward"): True,
        ("Ted", "Margaret"): False,
    }
    assert nickname_pairs(spark).count() == len(pairs)
