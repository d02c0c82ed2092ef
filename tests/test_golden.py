"""Golden-record survivorship rules."""

from __future__ import annotations

import pytest

from mismo_spark.cluster.golden import golden_record


def _data(spark):
    records = spark.createDataFrame(
        [
            (1, "Bob", "bob@x.com", 10),
            (2, "Robert", "bob@x.com", 30),
            (3, "Rob", None, 20),
            (4, "Zed", "z@y.org", 5),
            (5, None, None, None),
        ],
        "record_id long, name string, email string, age long",
    )
    assignments = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4), (5, 5)],
        "record_id long, component long",
    )
    return records, assignments


def test_golden_record_rules(spark):
    records, assignments = _data(spark)
    out = {
        r["component"]: r
        for r in golden_record(
            records,
            assignments,
            {"name": "longest", "email": "mode", "age": "max"},
        ).collect()
    }
    g1 = out[1]
    assert g1["n_records"] == 3
    assert g1["name"] == "Robert"        # longest
    assert g1["email"] == "bob@x.com"    # mode ignores the NULL
    assert g1["age"] == 30
    g4 = out[4]
    assert (g4["name"], g4["email"], g4["age"]) == ("Zed", "z@y.org", 5)
    g5 = out[5]
    assert (g5["name"], g5["email"], g5["age"]) == (None, None, None)


def test_golden_record_first_and_ties(spark):
    records = spark.createDataFrame(
        [(1, "bb", "x"), (2, "aa", "y"), (3, "cc", "y"), (4, "dd", "x")],
        "record_id long, name string, tag string",
    )
    assignments = spark.createDataFrame(
        [(i, 1) for i in (1, 2, 3, 4)], "record_id long, component long"
    )
    r = golden_record(
        records, assignments, {"name": "longest", "tag": "mode"}
    ).first()
    # all names length 2 -> lexicographically largest wins
    assert r["name"] == "dd"
    # x and y tie at 2 -> smallest value wins
    assert r["tag"] == "x"
    r2 = golden_record(records, assignments, {"name": "first"}).first()
    assert r2["name"] == "bb"  # record_id 1


def test_golden_record_validates(spark):
    records, assignments = _data(spark)
    with pytest.raises(ValueError):
        golden_record(records, assignments, {"name": "best"})
    with pytest.raises(ValueError):
        golden_record(records, assignments, {"nope": "min"})
