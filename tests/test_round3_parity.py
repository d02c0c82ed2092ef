"""Round-2 parity additions: playdata loaders, Updates accessors,
UnionTable, Emails/Addresses dimensions.

Reference tests mirrored: mismo/tests/test_playdata.py,
mismo/types/tests/test_updates.py, mismo/lib/email/tests/test_email.py
(dimension paths), mismo/lib/geo/tests/test_address.py.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mismo_spark.lib.address import AddressesDimension, AddressesMatchLevel
from mismo_spark.lib.email import EmailMatchLevel, EmailsDimension
from mismo_spark.playdata import load_febrl, load_rldata
from mismo_spark.types.union_table import UnionTable
from mismo_spark.types.updates import Updates
from tests.conftest import assert_df_equal, rows_set

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


# -- playdata ------------------------------------------------------------


def test_load_febrl_schema_and_links(spark):
    lk = load_febrl(spark, os.path.join(FIXTURES, "febrl_tiny.csv"))
    assert lk.left.count() == 10
    # leading zeros preserved: postcode stays string
    assert dict(lk.left.dtypes)["postcode"] == "string"
    assert lk.left.filter(F.col("postcode") == "01234").count() == 2
    # ground-truth links: one pair per 2-element label cluster
    got = rows_set(lk.links.select("record_id_l", "record_id_r"))
    assert got == {(0, 1), (2, 3), (5, 6), (8, 9)}


def test_load_rldata_links(spark):
    lk = load_rldata(spark, os.path.join(FIXTURES, "rldata_tiny.csv"))
    assert lk.left.count() == 6
    # fname_c2 empty strings become nulls (reference CSV semantics)
    assert lk.left.filter(F.col("fname_c2").isNull()).count() == 6
    got = rows_set(lk.links.select("record_id_l", "record_id_r"))
    assert got == {(0, 3), (1, 5)}


def test_febrl_end_to_end_keylinker_fs(spark):
    """The SURVEY §5 'playdata smoke': block on postcode, compare, and
    check candidate recall against ground truth."""
    from mismo_spark.linker.key import KeyLinker

    lk = load_febrl(spark, os.path.join(FIXTURES, "febrl_tiny.csv"))
    cand = KeyLinker(["postcode"], task="dedupe")(lk.left, lk.left)
    got = rows_set(cand.links.select("record_id_l", "record_id_r"))
    truth = rows_set(lk.links.select("record_id_l", "record_id_r"))
    assert truth <= got  # blocking on postcode finds every true pair


# -- Updates ------------------------------------------------------------


@pytest.fixture
def before_after(spark):
    before = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "id long, s string, v long"
    )
    after = spark.createDataFrame(
        [(1, "a", 11), (2, "b", 20), (3, "z", 30)], "id long, s string, v long"
    )
    return before, after


def test_updates_from_tables_before_after(spark, before_after):
    before, after = before_after
    u = Updates.from_tables(before, after, join_on="id")
    assert set(u.df.columns) == {"id", "s", "v"}
    assert_df_equal(u.before(), rows_set(before), columns=["id", "s", "v"])
    assert_df_equal(u.after(), rows_set(after), columns=["id", "s", "v"])


def test_updates_filter_is_changed(spark, before_after):
    from mismo_spark.types.updates import is_changed

    before, after = before_after
    u = Updates.from_tables(before, after, join_on="id")
    changed = u.filter(is_changed(u.df["v"]) | is_changed(u.df["s"]))
    got = {r["id"] for r in changed.before().select("id").collect()}
    assert got == {1, 3}


def test_updates_apply_to(spark, before_after):
    before, after = before_after
    u = Updates.from_tables(before, after, join_on="id")
    result = u.apply_to(before)
    assert rows_set(result) == rows_set(after)


def test_updates_apply_to_new_column_requires_defaults(spark, before_after):
    before, after = before_after
    after2 = after.withColumn("extra", F.lit("x"))
    u = Updates.from_tables(before, after2, join_on="id")
    with pytest.raises(ValueError, match="defaults"):
        u.apply_to(before)
    result = u.apply_to(before, defaults=None)
    assert "extra" in result.columns
    assert result.count() == 3


def test_updates_schema_change(spark, before_after):
    before, after = before_after
    u = Updates.from_tables(before, after.drop("v").withColumn("w", F.lit(1)), join_on="id")
    assert u.schema_change("v") == "removed"
    assert u.schema_change("w") == "added"
    assert u.schema_change("s") == "unchanged"


# -- UnionTable ----------------------------------------------------------


def test_union_table_distributes(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id long, s string")
    b = spark.createDataFrame([(3, "x")], "id long, s string")
    ut = UnionTable([a, b])
    assert ut.count() == 3
    filtered = ut.filter(F.col("s") == "x")
    assert filtered.count() == 2
    # provenance preserved: each part filtered independently
    assert [t.count() for t in filtered.tables] == [1, 1]
    sel = ut.select("id").withColumn("id2", F.col("id") * 2)
    assert rows_set(sel.df) == {(1, 2), (2, 4), (3, 6)}
    with pytest.raises(ValueError):
        UnionTable([])


# -- EmailsDimension -----------------------------------------------------


def test_emails_dimension_roundtrip(spark):
    dim = EmailsDimension("emails")
    t = spark.createDataFrame(
        [
            (1, ["Bob.Smith@gmail.com", "b@x.org"]),
            (2, ["bobsmith@gmail.com"]),
            (3, ["carol@y.net"]),
            (4, []),
        ],
        "record_id long, emails array<string>",
    )
    prepped = dim.prepare(t)
    row = prepped.filter("record_id = 1").select(dim.column_parsed).first()[0]
    # normalize lowers and strips '.'/'_' (mismo/lib/email/_core.py:16-30)
    assert row[0]["full"] == "bobsmith@gmailcom"
    assert row[0]["user"] == "bobsmith"
    assert row[0]["domain"] == "gmailcom"

    lk = dim.block(prepped, task="dedupe")
    got = rows_set(lk.links.select("record_id_l", "record_id_r"))
    assert got == {(1, 2)}

    pairs = lk.links_with_both()
    compared = dim.compare(pairs)
    lvl = compared.select(dim.column_compared).first()[0]
    assert lvl == int(EmailMatchLevel.FULL_EXACT)


def test_emails_dimension_near_level(spark):
    dim = EmailsDimension("emails")
    t = spark.createDataFrame(
        [(1, ["alice@x.com"]), (2, ["alicf@x.com"]), (3, ["alice@z.io"]), (4, [])],
        "record_id long, emails array<string>",
    )
    prepped = dim.prepare(t)
    lx = prepped.select(F.col("record_id").alias("record_id_l"),
                        F.col(dim.column_parsed).alias(dim.column_parsed + "_l"))
    rx = prepped.select(F.col("record_id").alias("record_id_r"),
                        F.col(dim.column_parsed).alias(dim.column_parsed + "_r"))
    pairs = lx.crossJoin(rx).filter("record_id_l < record_id_r")
    lv = {
        (r["record_id_l"], r["record_id_r"]): r[dim.column_compared]
        for r in dim.compare(pairs).collect()
    }
    assert lv[(1, 2)] == int(EmailMatchLevel.FULL_NEAR)  # DL=1 on full
    assert lv[(1, 3)] == int(EmailMatchLevel.USER_EXACT)
    assert lv[(1, 4)] == int(EmailMatchLevel.ELSE)  # empty array


# -- AddressesDimension ---------------------------------------------------


def _addr(street1, city, state, postal):
    return {
        "street1": street1,
        "street2": None,
        "city": city,
        "state": state,
        "postal_code": postal,
    }


def test_addresses_dimension(spark):
    dim = AddressesDimension("addresses")
    schema = (
        "record_id long, addresses array<struct<street1:string,street2:string,"
        "city:string,state:string,postal_code:string>>"
    )
    t = spark.createDataFrame(
        [
            (1, [_addr("12 Main St", "Springfield", "VA", "11111")]),
            (2, [_addr("12 MAIN STREET", "Springfield", "VA", "11111"),
                 _addr("99 Oak Ave", "Rivertown", "NY", "22222")]),
            (3, [_addr("500 Pine Rd", "Lakeside", "VA", "33333")]),
        ],
        schema,
    )
    prepped = dim.prepare(t)
    feat = prepped.filter("record_id = 1").select(dim.column_featured).first()[0]
    assert feat[0]["street_name"] == "MAIN"
    assert feat[0]["street_number"] == "12"

    lk = dim.block(prepped, task="dedupe")
    got = rows_set(lk.links.select("record_id_l", "record_id_r"))
    # 1 and 2 share (street_number, street_name, postal) after normalization
    assert got == {(1, 2)}

    lx = prepped.select(F.col("record_id").alias("record_id_l"),
                        F.col(dim.column_featured).alias(dim.column_featured + "_l"))
    rx = prepped.select(F.col("record_id").alias("record_id_r"),
                        F.col(dim.column_featured).alias(dim.column_featured + "_r"))
    pairs = lx.crossJoin(rx).filter("record_id_l < record_id_r")
    lv = {
        (r["record_id_l"], r["record_id_r"]): r[dim.column_compared]
        for r in dim.compare(pairs).collect()
    }
    # same normalized street name + number + city => typo-level match
    assert lv[(1, 2)] <= int(AddressesMatchLevel.POSSIBLE_TYPO)
    # same state only (record 2's first address is also VA)
    assert lv[(1, 3)] == int(AddressesMatchLevel.SAME_STATE)
    assert lv[(2, 3)] == int(AddressesMatchLevel.SAME_STATE)
