"""Isolated noop-sink timing of the edit_distance bench stage and its
sub-pieces (guide §1.4), bracketed by spin calibrations.

Usage: python scripts/profile_edjoin.py [corpus.parquet] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from mismo_spark.session import get_spark
from bench_scaling import _calibrate

CORPUS = sys.argv[1] if len(sys.argv) > 1 else "/tmp/mismo_prof_corpus.parquet"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    spark = get_spark(
        "profile_edjoin", master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS) * 2, 8),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    sc = spark.sparkContext
    pages = spark.read.parquet(CORPUS)
    names = pages.select(
        F.col("url").alias("record_id"),
        F.substring(F.col("text"), 1, 24).alias("name"),
    )
    names.persist().count()

    from mismo_spark.text.edjoin import edit_distance_pairs, choose_q

    def timed(tag, fn):
        sc.setJobDescription(tag)
        pre = _calibrate(int(CPUS))[f"cal_{CPUS}core_mups"]
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        post = _calibrate(int(CPUS))[f"cal_{CPUS}core_mups"]
        print(f"{tag:42s} {dt:8.3f}s  n={n}  cal {pre:.0f}/{post:.0f}", flush=True)
        sc.setJobDescription(None)

    # warmup
    timed("warmup: full edit_distance q=auto", lambda: edit_distance_pairs(
        names, "name", max_distance=1, q="auto").count())
    for r in range(REPS):
        timed(f"choose_q (rep {r})", lambda: choose_q(
            names.select(F.col("name").alias("__s")), max_distance=1))
        timed(f"full q=auto (rep {r})", lambda: edit_distance_pairs(
            names, "name", max_distance=1, q="auto").count())
        timed(f"full q=5 explicit (rep {r})", lambda: edit_distance_pairs(
            names, "name", max_distance=1, q=5).count())
    spark.stop()


if __name__ == "__main__":
    main()
