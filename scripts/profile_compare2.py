"""Second-stage compare profiling: why is full compare ~3x the sum of
its isolated features?  Tests plan-shape hypotheses with a cached pair
table so iteration is fast."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mismo_spark.session import get_spark
from mismo_spark.pipeline import DedupePipeline, pair_features
from mismo_spark.types.linkage import Linkage
from mismo_spark.compare.enum import compare

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_ENTITIES = int(os.environ.get("BENCH_N_ENTITIES", "30000"))
CACHE = "/tmp/profile_cache"


def main() -> None:
    spark = get_spark(
        "profile_compare2",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS) * 2, 8),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    pairs_path = os.path.join(CACHE, "pairs.parquet")
    if not os.path.exists(pairs_path):
        from mismo_spark.corpus import make_corpus

        corpus_path = os.path.join(CACHE, "corpus.parquet")
        make_corpus(
            spark, N_ENTITIES, seed=42, skew_every=2000, n_partitions=int(CPUS) * 2
        ).write.mode("overwrite").parquet(corpus_path)
        pages = spark.read.parquet(corpus_path)
        pipe = DedupePipeline(work_dir=os.path.join(CACHE, "wk"), checkpoint=False, seed=42)
        records = pipe.prepare_records(pages.drop("label_true"))
        records.persist()
        records.count()
        links = pipe.blocker()(records, records).links
        narrow = records.select(
            "record_id", "path", "prefix", "text_fp", "tok_hashes", "shingle_hashes"
        )
        Linkage(narrow, narrow, links).links_with_both(
            broadcast_records=True
        ).write.mode("overwrite").parquet(pairs_path)

    pairs = spark.read.parquet(pairs_path)
    pairs.persist()
    print("pairs:", pairs.count(), flush=True)
    pipe = DedupePipeline(work_dir="/tmp/wk2", checkpoint=False, seed=42)

    # A: all five features in ONE projection, aggregated directly
    pf = pair_features(pairs)
    t0 = time.time()
    pf.agg(
        F.count(F.lit(1)),
        F.sum(F.col("fp_eq").cast("int")),
        F.sum("tok_jac"),
        F.sum("shingle_jac"),
        F.sum("prefix_lev"),
        F.sum("path_jw"),
    ).collect()
    print(f"A pair_features-only agg: {time.time() - t0:.2f}s", flush=True)

    # B: full compare as bench does
    t0 = time.time()
    compare(pair_features(pairs), pipe.comparers).agg(
        F.count(F.lit(1)), *[F.sum(c.name) for c in pipe.comparers]
    ).collect()
    print(f"B full compare (current): {time.time() - t0:.2f}s", flush=True)

    cmp_b = compare(pair_features(pairs), pipe.comparers)
    print(cmp_b.explain("formatted"), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
