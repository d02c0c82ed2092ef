"""Every driver query/oracle pair, verified inside pytest at sf0.001.

This is the driver's CORRECTNESS gate run pre-emptively: each
``__spark_entry__.queries()`` entry executes on the shared Spark
session and its ``oracle_sql()`` on DuckDB, compared on row count +
columns + order-insensitive 6-dp values — the same comparator the
driver uses (scripts/check_oracles.py).  Parametrized per query so a
regression names the operator that broke.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import __spark_entry__ as entry_mod
from check_oracles import compare_one, duckdb_connection

SF_DIR = os.environ.get("ORACLE_TEST_SF_DIR", "/root/testdata/sf0.001")

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def duck():
    con = duckdb_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_oracle_parity(spark, duck, name):
    oracle = _ORACLES.get(name)
    status = compare_one(spark, duck, SF_DIR, name, _QUERIES[name], oracle)
    assert not status, f"{name}: {'; '.join(status)}"
    if oracle is None:
        pytest.skip(f"{name} has no oracle (rows-only per driver contract)")
