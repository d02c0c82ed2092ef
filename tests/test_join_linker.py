"""JoinLinker + slow-join guard matrix
(mismo/linkage/tests/test_slow_join.py:9-54)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mismo_spark import JoinLinker, SlowJoinError, check_join_plan
from mismo_spark.linker.join import SlowJoinWarning


def test_equi_condition_is_fast(t1, t2):
    lk = JoinLinker(lambda l, r: l["letter"] == r["letter"], on_slow="error")(t1, t2)
    got = {(r["record_id_l"], r["record_id_r"]) for r in lk.links.collect()}
    assert got == {(1, 90), (2, 91)}


def test_non_equi_condition_raises(t1, t2):
    with pytest.raises(SlowJoinError):
        JoinLinker(lambda l, r: l["int"] < r["int"], on_slow="error")(t1, t2)


def test_always_true_condition_raises(t1, t2):
    with pytest.raises(SlowJoinError):
        JoinLinker(lambda l, r: F.lit(True), on_slow="error")(t1, t2)


def test_on_slow_warn(t1, t2):
    with pytest.warns(SlowJoinWarning):
        JoinLinker(lambda l, r: l["int"] < r["int"], on_slow="warn")(t1, t2)


def test_on_slow_ignore(t1, t2):
    lk = JoinLinker(lambda l, r: l["int"] < r["int"], on_slow="ignore")(t1, t2)
    assert lk.links.count() > 0


def test_mixed_equi_plus_range_is_fast(t1, t2):
    # equi key lets Catalyst pick a hash join; range is a post-filter
    lk = JoinLinker(
        lambda l, r: (l["letter"] == r["letter"]) & (l["int"] <= r["int"]),
        on_slow="error",
    )(t1, t2)
    assert {(r["record_id_l"], r["record_id_r"]) for r in lk.links.collect()} == {
        (1, 90),
        (2, 91),
    }


def test_check_join_plan_direct(t1, t2):
    cross = t1.crossJoin(t2)
    with pytest.raises(SlowJoinError):
        check_join_plan(cross, "error")
    check_join_plan(cross, "ignore")  # no-op


def test_self_join_dedupe_same_dataframe(t1):
    # df.alias(x)["col"] binds the original attribute id, which Spark
    # rejects as ambiguous when both sides share the plan; the _Side
    # resolver must keep self-join dedupe working on the SAME DataFrame.
    lk = JoinLinker(lambda l, r: l["int"] == r["int"] - 1, task="dedupe",
                    on_slow="ignore")(t1, t1)
    got = {(r["record_id_l"], r["record_id_r"]) for r in lk.links.collect()}
    assert got == {(0, 1), (1, 2)}


def test_condition_attribute_access(t1, t2):
    lk = JoinLinker(lambda l, r: l.letter == r.letter, on_slow="error")(t1, t2)
    got = {(r["record_id_l"], r["record_id_r"]) for r in lk.links.collect()}
    assert got == {(1, 90), (2, 91)}
