"""Per-dimension cost breakdown of the compare stage.

Forces evaluation of each comparison dimension separately (agg over the
label column so Catalyst can't prune it) on the same blocked pairs.

Usage: python scripts/profile_compare.py [entities] [cpus]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    entities = int(sys.argv[1]) if len(sys.argv) > 1 else 100000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from mismo_spark.session import get_spark
    from mismo_spark.corpus import make_corpus
    from mismo_spark.pipeline import DedupePipeline, pair_features
    from mismo_spark.types.linkage import Linkage
    from mismo_spark.compare.enum import compare

    spark = get_spark("profile_cmp", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    tmp = tempfile.mkdtemp()
    make_corpus(spark, entities, seed=42, skew_every=2000, n_partitions=64).write.mode(
        "overwrite"
    ).parquet(tmp + "/c.parquet")
    pages = spark.read.parquet(tmp + "/c.parquet")
    pipe = DedupePipeline(work_dir="/tmp/x", checkpoint=False, seed=42)
    records = pipe.prepare_records(pages)
    records.persist()
    records.count()
    links = pipe.blocker()(records, records).links
    links.persist()
    print("pairs", links.count(), flush=True)

    narrow = records.select(
        "record_id", "path", "prefix", "text_fp", "tok_hashes", "shingle_hashes"
    )
    pairs = Linkage(narrow, narrow, links).links_with_both(broadcast_records=True)

    # baseline: join only, force row materialization via a cheap column
    t = time.time()
    pairs.agg(F.count("record_id_l"), F.expr("bit_xor(text_fp_l)")).collect()
    print("join_only", round(time.time() - t, 1), flush=True)

    for c in pipe.comparers:
        t = time.time()
        compare(pair_features(pairs), [c]).agg(F.sum(c.name)).collect()
        print(c.name, round(time.time() - t, 1), flush=True)

    t = time.time()
    compare(pair_features(pairs), pipe.comparers).agg(
        *[F.sum(c.name) for c in pipe.comparers]
    ).collect()
    print("all_dims", round(time.time() - t, 1), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
