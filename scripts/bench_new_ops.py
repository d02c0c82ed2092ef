"""Micro-benchmark the round-4 structural operators at sf0.1:
one-to-one assignment, canopy clustering, KwikCluster pivots, k-core.

Since round 5 these stages (minus core_numbers, plus pagerank) are
timed inside bench.py itself with full calibration bracketing — this
script remains as the standalone quick probe.

Each runs the exact driver query from __spark_entry__ (so the numbers
describe the oracle-checked plans) and reports wall seconds + output
rows, with the same 32-core spin calibration bench.py uses bracketing
the block so a reader can judge host weather.  One JSON line.

Usage: python scripts/bench_new_ops.py [sf_dir] [cpus]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    import __spark_entry__ as entry
    from bench_scaling import _calibrate
    from mismo_spark.session import get_spark

    spark = get_spark(
        "bench_new_ops", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    out: dict = {"sf": sf_dir, "cpus": cpus}
    out["cal_pre"] = _calibrate(cpus)

    queries = entry.queries()
    for name in (
        "one_to_one_match",
        "canopy_assign",
        "pivot_clustering",
        "center_clustering",
        "core_numbers",
        "clk_dice_pairs",
    ):
        t0 = time.monotonic()
        n = queries[name](spark, sf_dir).count()
        out[name] = {"sec": round(time.monotonic() - t0, 3), "rows": n}

    out["cal_post"] = _calibrate(cpus)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
