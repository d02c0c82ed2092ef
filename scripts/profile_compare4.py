"""Order-controlled re-run: D first, B, F, then B again."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mismo_spark.session import get_spark
from mismo_spark.pipeline import DedupePipeline, pair_features
from mismo_spark.compare.enum import compare

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
CACHE = "/tmp/profile_cache"


def main() -> None:
    spark = get_spark(
        "profile_compare4",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS) * 2, 8),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    pairs = spark.read.parquet(os.path.join(CACHE, "pairs.parquet"))
    pairs.persist()
    print("pairs:", pairs.count(), flush=True)
    pipe = DedupePipeline(work_dir="/tmp/wk4", checkpoint=False, seed=42)

    def agg_labels(df):
        return df.agg(
            F.count(F.lit(1)), *[F.sum(c.name) for c in pipe.comparers]
        ).collect()

    # warmup
    agg_labels(compare(pair_features(pairs.limit(10000)), pipe.comparers))

    def level_from_thresholds(col, thresholds, pre=None, pre_level_shift=1):
        out = F.lit(pre_level_shift)
        for t in thresholds:
            out = out + F.when(col < t, 1).otherwise(0)
        if pre is not None:
            out = F.when(pre, 0).otherwise(out)
        return out

    def run_D():
        pf = pair_features(pairs)
        labels = pf.select(
            level_from_thresholds(
                F.col("tok_jac"), [0.9, 0.7, 0.4], pre=F.col("fp_eq")
            ).alias("text_jaccard"),
            level_from_thresholds(
                F.col("shingle_jac"), [0.55, 0.3, 0.12], pre_level_shift=0
            ).alias("shingle_jaccard"),
            level_from_thresholds(
                F.col("prefix_lev"), [0.9, 0.7], pre_level_shift=0
            ).alias("text_prefix_lev"),
            level_from_thresholds(
                F.col("path_jw"), [0.93, 0.85], pre_level_shift=0
            ).alias("url_path_jw"),
        )
        labels.agg(
            F.count(F.lit(1)),
            F.sum("text_jaccard"),
            F.sum("shingle_jaccard"),
            F.sum("text_prefix_lev"),
            F.sum("url_path_jw"),
        ).collect()

    t0 = time.time()
    run_D()
    print(f"D sum-of-bools (first): {time.time() - t0:.2f}s", flush=True)

    t0 = time.time()
    agg_labels(compare(pair_features(pairs), pipe.comparers))
    print(f"B current: {time.time() - t0:.2f}s", flush=True)

    t0 = time.time()
    feats2 = pair_features(pairs).localCheckpoint(eager=False)
    agg_labels(compare(feats2, pipe.comparers))
    print(f"F localCheckpoint barrier: {time.time() - t0:.2f}s", flush=True)

    t0 = time.time()
    agg_labels(compare(pair_features(pairs), pipe.comparers))
    print(f"B current (again): {time.time() - t0:.2f}s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
