"""Bisect the block+compare stages at one parallelism level.

Usage: taskset -c 0-31 python scripts/profile_block.py <corpus.parquet> <cpus>

Times each sub-plan of the blocking stage separately (banded table,
bucket aggregation, pair emission, OR-union dedupe, compare join) so a
serial bottleneck shows up as a step whose wall time doesn't drop with
more cores.  Each step is timed twice — the delta between run 1 and
run 2 isolates one-time plan/codegen compile cost from steady-state
execution.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t(label: str, fn) -> None:
    for attempt in (1, 2):
        t0 = time.time()
        n = fn()
        print(f"{label} run{attempt}: {time.time() - t0:.2f}s (n={n})", flush=True)


def main() -> None:
    corpus_path, cpus = sys.argv[1], int(sys.argv[2])
    from pyspark.sql import functions as F

    from mismo_spark.linker.lsh import MinhashLshLinker
    from mismo_spark.pipeline import DedupePipeline
    from mismo_spark.session import get_spark
    from mismo_spark.types.linkage import Linkage

    spark = get_spark(
        f"profile_{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus * 2
    )
    pages = spark.read.parquet(corpus_path)
    pipe = DedupePipeline(work_dir="/tmp/unused", checkpoint=False, seed=42)
    records = pipe.prepare_records(pages)
    records.persist()
    print("records:", records.count(), flush=True)

    lsh = None
    for name, lk in getattr(pipe.blocker(), "linkers", {}).items():
        if isinstance(lk, MinhashLshLinker):
            lsh = lk
            print("lsh linker:", name, flush=True)
    if lsh is None:
        lsh = MinhashLshLinker("shingle_hashes", band_size=2, n_bands=32, seed=42)

    banded = lsh._banded(records)
    t("banded", lambda: banded.count())

    buckets = (
        banded.groupBy("__key")
        .agg(F.sort_array(F.collect_list("record_id")).alias("__ids"))
        .filter(F.size("__ids") >= 2)
    )
    t("buckets", lambda: buckets.count())
    t(
        "bucket_histogram",
        lambda: buckets.select(F.size("__ids").alias("s"))
        .groupBy()
        .agg(F.max("s"), F.sum(F.col("s") * (F.col("s") - 1) / 2))
        .collect(),
    )

    t("lsh_links", lambda: lsh(records).links.count())

    full = pipe.blocker()(records, records).links
    t("block_full", lambda: full.count())

    links = full.persist()
    links.count()
    narrow = records.select(
        "record_id", "path", "prefix", "text_fp", "tok_hashes", "shingle_hashes"
    )
    from mismo_spark.compare.enum import compare
    from mismo_spark.pipeline import pair_features

    def run_compare():
        pairs = Linkage(narrow, narrow, links).links_with_both(
            broadcast_records=True
        )
        compared = compare(pair_features(pairs), pipe.comparers)
        return compared.agg(
            F.count(F.lit(1)),
            *[F.sum(c.name) for c in pipe.comparers],
        ).collect()[0][0]

    t("compare", run_compare)
    spark.stop()


if __name__ == "__main__":
    main()
