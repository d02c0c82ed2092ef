"""Bucketed co-partition persistence: the links_with_both scale regime
beyond broadcast (types/linkage.py docstring) — shuffle paid once at
write, joins plan exchange-free afterwards."""

from __future__ import annotations

import re
from contextlib import contextmanager

import pytest

from mismo_spark.types.linkage import Linkage


@contextmanager
def _conf(spark, **kv):
    old = {k: spark.conf.get(k, None) for k in kv}
    for k, v in kv.items():
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _shuffle_exchanges(df) -> list[str]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.findall(
        r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)[^\n]*",
        plan,
    )


def _linkage(spark) -> Linkage:
    recs = spark.createDataFrame(
        [(i, f"rec {i}", i % 5) for i in range(40)],
        "record_id long, text string, grp long",
    )
    links = spark.createDataFrame(
        [(i, (i + 1) % 40) for i in range(0, 40, 2)],
        "record_id_l long, record_id_r long",
    )
    return Linkage(recs, recs, links)


@pytest.fixture
def bucketed(spark, tmp_path):
    lk = _linkage(spark)
    lk.to_bucketed_tables("bktest", n_buckets=4, path=str(tmp_path), overwrite=True)
    yield Linkage.from_bucketed_tables(spark, "bktest")
    for part in ("left", "right", "links"):
        spark.sql(f"DROP TABLE IF EXISTS bktest_{part}")


def test_bucketed_round_trip_matches_plain(spark, bucketed):
    plain = _linkage(spark).links_with_both().collect()
    buck = bucketed.links_with_both().collect()
    key = lambda r: (r["record_id_l"], r["record_id_r"])  # noqa: E731
    assert sorted(map(key, buck)) == sorted(map(key, plain))
    assert len(buck) == 20


def test_bucketed_links_with_left_zero_exchanges(spark, bucketed):
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        },
    ):
        df = bucketed.links_with_left()
        exchanges = _shuffle_exchanges(df)
        assert exchanges == [], exchanges
        assert df.count() == 20


def test_bucketed_links_with_both_single_exchange(spark, bucketed):
    with _conf(
        spark,
        **{
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.enabled": "false",
        },
    ):
        df = bucketed.links_with_both()
        exchanges = _shuffle_exchanges(df)
        # only the pairs intermediate re-keys on record_id_r; both
        # bucketed record scans stay exchange-free
        assert len(exchanges) == 1, exchanges
        assert "record_id_r" in exchanges[0]
        assert df.count() == 20
