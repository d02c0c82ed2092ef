"""Capture .explain('formatted') for a set of declared queries.

Usage: python scripts/capture_plans.py <repo_root> <out_dir> <suffix> [query ...]

Runs each __spark_entry__.queries() entry from <repo_root> at sf0.001
(iterative queries execute their loops during construction — cheap at
that scale) and writes <out_dir>/<query>_<suffix>.txt.  For queries
whose build runs a driver loop, the captured plan is the final-result
plan; the per-round plan shape is described in OPTIMIZATION_r06.md.
"""

from __future__ import annotations

import os
import sys

repo = sys.argv[1]
out_dir = sys.argv[2]
suffix = sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, repo)
sys.path.insert(0, os.path.join(repo, "scripts"))

from mismo_spark.session import get_spark  # noqa: E402

SF = os.environ.get("PLAN_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_spark("capture_plans", master="local[8]", shuffle_partitions=8)
    import __spark_entry__ as entry

    qs = entry.queries()
    os.makedirs(out_dir, exist_ok=True)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
