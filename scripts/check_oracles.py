"""Local mimic of the driver's correctness check: run each
__spark_entry__.queries() entry on Spark and its oracle_sql() on DuckDB
at sf=0.01, compare row count + column names + order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as entry_mod
from mismo_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle_check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sdf.columns
        if name not in oracles:
            print(f"  {name:24s} rows-only: {len(srows)} rows  cols={scols}")
            continue
        try:
            ores = con.execute(oracles[name])
            ocols = [d[0] for d in ores.description]
            orows = ores.fetchall()
        except Exception as e:
            failures.append((name, f"oracle SQL error: {e}"))
            print(f"✗ {name:24s} ORACLE SQL ERROR: {e}")
            continue
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
                diff = [
                    (a, b) for a, b in zip(sset, oset) if a != b
                ][:3]
                status.append(f"values differ, first diffs: {diff}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"✗ {name:24s} {'; '.join(status)[:300]}")
        else:
            print(f"✓ {name:24s} {len(srows)} rows")
    spark.stop()
    if failures:
        print(f"\n{len(failures)} FAILURES")
        return 1
    print("\nall oracle checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
