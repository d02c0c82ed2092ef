"""Local mimic of the driver's correctness check: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
at sf=0.01, compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]

``compare_one`` is importable — tests/test_oracles.py runs every
query/oracle pair through it at sf0.001 inside the pytest suite, so an
oracle regression is caught before the driver ever runs.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duckdb_connection(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, list):
        return tuple(canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, canon(x)) for k, x in v.items()))
    return v


def compare_one(spark, con, sf_dir: str, name: str, fn, oracle: str | None):
    """Run one query/oracle pair; return a list of mismatch strings
    (empty = pass).  ``oracle=None`` → rows-only (no comparison)."""
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    if oracle is None:
        return []
    ores = con.execute(oracle)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    status = []
    if len(srows) != len(orows):
        status.append(f"rowcount spark={len(srows)} duck={len(orows)}")
    if sorted(scols) != sorted(ocols):
        status.append(f"cols spark={scols} duck={ocols}")
    if not status:
        # order-insensitive value compare, columns sorted by name
        order = sorted(range(len(scols)), key=lambda i: scols[i])
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        sset = sorted(
            (tuple(canon(row[scols[i]]) for i in order) for row in srows),
            key=repr,
        )
        oset = sorted(
            (tuple(canon(r[i]) for i in oorder) for r in orows), key=repr
        )
        if sset != oset:
            diff = [(a, b) for a, b in zip(sset, oset) if a != b][:3]
            status.append(f"values differ, first diffs: {diff}")
    return status


def main() -> int:
    import __spark_entry__ as entry_mod
    from mismo_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", shuffle_partitions=8)
    con = duckdb_connection(sf_dir)

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        oracle = oracles.get(name)
        try:
            status = compare_one(spark, con, sf_dir, name, fn, oracle)
        except Exception as e:
            failures.append((name, f"error: {e}"))
            print(f"✗ {name:24s} ERROR: {str(e)[:300]}")
            continue
        if oracle is None:
            print(f"  {name:24s} rows-only")
        elif status:
            failures.append((name, "; ".join(status)))
            print(f"✗ {name:24s} {'; '.join(status)[:300]}")
        else:
            print(f"✓ {name:24s} pass")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        return 1
    print("\nall oracle checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
