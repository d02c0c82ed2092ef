"""Interleaved A/B of the compare stage: CASE-chain labels (legacy)
vs least-of-whens labels (new EnumComparer.label_column).  Replays the
REAL bench compare stage (pair join + features + labels + persist)
3x each, alternating, in one session — host-weather-robust."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mismo_spark.session import get_spark
from mismo_spark.pipeline import DedupePipeline
from mismo_spark.types.linkage import Linkage

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_ENTITIES = int(os.environ.get("BENCH_N_ENTITIES", "30000"))
CACHE = "/tmp/profile_cache"


def legacy_label(comparer, pairs):
    out = None
    for i, case in enumerate(comparer.cases):
        cond = case.condition(pairs) if callable(case.condition) else case.condition
        out = F.when(cond, F.lit(i)) if out is None else out.when(cond, F.lit(i))
    return out.otherwise(F.lit(comparer.else_index))


def main() -> None:
    spark = get_spark(
        "profile_compare5",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS) * 2, 8),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    corpus_path = os.path.join(CACHE, "corpus.parquet")
    if not os.path.exists(corpus_path):
        from mismo_spark.corpus import make_corpus

        make_corpus(
            spark, N_ENTITIES, seed=42, skew_every=2000, n_partitions=int(CPUS) * 2
        ).write.mode("overwrite").parquet(corpus_path)
    pages = spark.read.parquet(corpus_path)
    pipe = DedupePipeline(work_dir="/tmp/wk5", checkpoint=False, seed=42)
    records = pipe.prepare_records(pages.drop("label_true"))
    records.persist()
    records.count()
    links = pipe.blocker()(records, records).links
    links.persist()
    print("pairs:", links.count(), flush=True)

    from mismo_spark.pipeline import pair_features

    def run_stage(label_fn):
        narrow = records.select(
            "record_id", "path", "prefix", "text_fp", "tok_hashes", "shingle_hashes"
        )
        pairs = Linkage(narrow, narrow, links).links_with_both(broadcast_records=True)
        pf = pair_features(pairs)
        compared = pf.select(
            "record_id_l",
            "record_id_r",
            *[label_fn(c, pf).alias(c.name) for c in pipe.comparers],
        )
        compared.persist()
        n = compared.count()
        sums = compared.agg(*[F.sum(c.name) for c in pipe.comparers]).collect()[0]
        compared.unpersist()
        return n, tuple(sums)

    # warmup both codegen paths
    run_stage(legacy_label)

    results = {"legacy": [], "least": []}
    checks = {}
    for rnd in range(3):
        for name, fn in (
            ("legacy", legacy_label),
            ("least", lambda c, p: c.label_column(p)),
        ):
            t0 = time.time()
            n, sums = run_stage(fn)
            dt = time.time() - t0
            results[name].append(round(dt, 2))
            checks[name] = (n, sums)
            print(f"round {rnd} {name}: {dt:.2f}s", flush=True)
    print("timings:", results, flush=True)
    print("label sums equal:", checks["legacy"] == checks["least"], checks, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
