"""Reference-API parity wrappers: exceptions, tf classes,
LinkCountsTable, ParsedEmail, NameStruct, parse_street1_re."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_exception_hierarchy():
    from mismo_spark import (
        MismoError,
        MismoWarning,
        SlowJoinError,
        SlowJoinWarning,
        UnsupportedBackendError,
    )

    assert issubclass(SlowJoinError, MismoError)
    assert issubclass(SlowJoinError, ValueError)
    assert issubclass(SlowJoinWarning, MismoWarning)
    assert issubclass(SlowJoinWarning, UserWarning)
    assert issubclass(UnsupportedBackendError, ValueError)


def test_slow_join_carries_algorithm(spark):
    from mismo_spark import SlowJoinError, check_join_plan

    a = spark.range(100).withColumnRenamed("id", "x")
    b = spark.range(100).withColumnRenamed("id", "y")
    crossed = a.join(b, F.col("x") < F.col("y"))
    with pytest.raises(SlowJoinError) as ei:
        check_join_plan(crossed)
    assert ei.value.algorithm in ("CartesianProduct", "BroadcastNestedLoopJoin")


def test_stats_table_and_column_stats(spark):
    from mismo_spark.tf import ColumnStats, StatsTable

    df = spark.createDataFrame(
        [("a",), ("a",), ("b",), (None,)], "v string"
    )
    st = StatsTable.from_column(df, "v")
    rows = {r["value"]: r for r in st.df.collect()}
    assert rows["a"]["count"] == 2 and abs(rows["a"]["frequency"] - 0.5) < 1e-12
    with pytest.raises(ValueError):
        StatsTable(df)  # wrong columns

    cs = ColumnStats(df, "v")
    probe = spark.createDataFrame([("a",), ("c",), (None,)], "v string")
    out = {r["v"]: r["frequency_v"] for r in cs.add_frequencies(probe).collect()}
    assert abs(out["a"] - 0.5) < 1e-12
    assert abs(out["c"] - 1.0 / 3) < 1e-12  # unseen -> 1/N of probe
    assert abs(out[None] - 1.0 / 3) < 1e-12
    out0 = {r["v"]: r["frequency_v"] for r in cs.add_frequencies(probe, default=0).collect()}
    assert out0["c"] == 0.0
    cs.unpersist()


def test_term_frequency_model(spark):
    from mismo_spark.tf import TermFrequencyModel

    df = spark.createDataFrame(
        [("a", "x"), ("a", "y"), ("b", "y")], "u string, w string"
    )
    tfm = TermFrequencyModel(df, ["u", "w"])
    out = tfm.add_term_frequencies(df).collect()
    r = {(x["u"], x["w"]): x for x in out}
    assert abs(r[("a", "x")]["frequency_u"] - 2 / 3) < 1e-12
    assert abs(r[("a", "x")]["frequency_w"] - 1 / 3) < 1e-12
    assert abs(r[("b", "y")]["frequency_w"] - 2 / 3) < 1e-12


def test_filterer_classes(spark):
    from mismo_spark.tf import AmbiguousHaystackFilterer, RareLookupFilterer

    hay = spark.createDataFrame(
        [(1, "smith"), (2, "smith"), (3, "smith"), (4, "rare")],
        "record_id long, surname string",
    )
    rare = RareLookupFilterer(["surname"], max_frequency=0.5)(hay)
    assert {r["surname"] for r in rare.collect()} == {"rare"}
    uniq = AmbiguousHaystackFilterer(["surname"])(hay)
    assert {r["surname"] for r in uniq.collect()} == {"rare"}


def test_link_counts_table(spark):
    from mismo_spark.types.counts_table import LinkCountsTable
    from mismo_spark.types.linked_table import link_counts

    records = spark.createDataFrame([(1,), (2,), (3,)], "record_id long")
    links = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "record_id_l long, record_id_r long"
    )
    lc = link_counts(records, links)
    assert isinstance(lc, LinkCountsTable)
    got = {r["n_links"]: r["n_records"] for r in lc.collect()}
    assert got == {2: 1, 1: 1, 0: 1}
    with pytest.raises(ValueError):
        LinkCountsTable(records)


def test_parsed_email(spark):
    from mismo_spark.lib.email import ParsedEmail, clean_email

    df = spark.createDataFrame(
        [("Bob.Smith@Gmail.com",), ("nodomain@",)], "e string"
    )
    p = ParsedEmail(clean_email(df["e"]))
    rows = df.select(p.as_struct().alias("p")).collect()
    assert rows[0]["p"]["user"] == "bob.smith"
    assert rows[0]["p"]["domain"] == "gmail.com"
    assert rows[1]["p"]["domain"] is None


def test_name_struct_constructor(spark):
    from mismo_spark.lib.name import NameStruct, normalize_name_struct

    df = spark.createDataFrame([("José", "Smith")], "g string, s string")
    out = df.select(
        normalize_name_struct(
            NameStruct(given=df["g"], surname=df["s"], prefix="Dr")
        ).alias("n")
    ).collect()[0]["n"]
    assert out["given"] == "JOSE"
    assert out["surname"] == "SMITH"
    assert out["prefix"] == "DR"
    assert out["middle"] is None or out["middle"] == ""


def test_parse_street1_re_alias():
    from mismo_spark.lib.address import parse_street1, parse_street1_re

    assert parse_street1_re is parse_street1
