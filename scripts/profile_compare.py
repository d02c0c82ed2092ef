"""Profile the compare stage feature-by-feature at bench scale.

Reproduces bench.py's block+compare setup, then times the pair-feature
projection with each feature column in isolation so we know where the
~80 s actually goes before optimizing.  Not part of the driver contract.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from mismo_spark.session import get_spark
from mismo_spark.corpus import make_corpus
from mismo_spark.pipeline import DedupePipeline, pair_features
from mismo_spark.types.linkage import ID_L, ID_R, Linkage
from mismo_spark.sets.compare import jaccard_distinct
from mismo_spark.text.similarity import (
    jaro_winkler_similarity,
    levenshtein_ratio,
)

CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_ENTITIES = int(os.environ.get("BENCH_N_ENTITIES", "30000"))


def main() -> None:
    spark = get_spark(
        "profile_compare",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS) * 2, 8),
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    tmp = tempfile.mkdtemp(prefix="profile_compare_")
    corpus_path = os.path.join(tmp, "corpus.parquet")
    make_corpus(
        spark, N_ENTITIES, seed=42, skew_every=2000, n_partitions=int(CPUS) * 2
    ).write.mode("overwrite").parquet(corpus_path)
    pages = spark.read.parquet(corpus_path)

    pipe = DedupePipeline(work_dir=os.path.join(tmp, "wk"), checkpoint=False, seed=42)
    records = pipe.prepare_records(pages.drop("label_true"))
    records.persist()
    print("records:", records.count(), flush=True)

    links = pipe.blocker()(records, records).links
    links.persist()
    print("candidate pairs:", links.count(), flush=True)

    narrow = records.select(
        "record_id", "path", "prefix", "text_fp", "tok_hashes", "shingle_hashes"
    )
    pairs = Linkage(narrow, narrow, links).links_with_both(broadcast_records=True)
    pairs.persist()
    print("pairs materialized:", pairs.count(), flush=True)

    # stats on the string pair columns
    stats = pairs.agg(
        F.countDistinct("path_l", "path_r").alias("uniq_path_pairs"),
        F.countDistinct("prefix_l", "prefix_r").alias("uniq_prefix_pairs"),
        F.avg(F.length("path_l")).alias("avg_path_len"),
        F.avg(F.length("prefix_l")).alias("avg_prefix_len"),
        F.avg(F.size("tok_hashes_l")).alias("avg_toks"),
        F.avg(F.size("shingle_hashes_l")).alias("avg_shingles"),
        F.avg((F.col("path_l") == F.col("path_r")).cast("int")).alias("path_eq_frac"),
    ).collect()[0]
    print(dict(stats.asDict()), flush=True)

    features = {
        "fp_eq": lambda: (F.col("text_fp_l") == F.col("text_fp_r")).alias("v"),
        "tok_jac": lambda: jaccard_distinct(
            F.col("tok_hashes_l"), F.col("tok_hashes_r")
        ).alias("v"),
        "shingle_jac": lambda: jaccard_distinct(
            F.col("shingle_hashes_l"), F.col("shingle_hashes_r")
        ).alias("v"),
        "prefix_lev": lambda: levenshtein_ratio(
            F.col("prefix_l"), F.col("prefix_r")
        ).alias("v"),
        "path_jw": lambda: jaro_winkler_similarity(
            F.col("path_l"), F.col("path_r")
        ).alias("v"),
    }
    # warmup
    pairs.select(ID_L, ID_R, features["fp_eq"]()).agg(F.count("v")).collect()
    for name, col in features.items():
        t0 = time.time()
        pairs.select(ID_L, ID_R, col()).agg(
            F.count("v"), F.sum(F.col("v").cast("double"))
        ).collect()
        print(f"feature {name}: {time.time() - t0:.2f}s", flush=True)

    # full pair_features + compare, as bench does
    from mismo_spark.compare.enum import compare

    t0 = time.time()
    compare(pair_features(pairs), pipe.comparers).agg(
        F.count(F.lit(1)), *[F.sum(c.name) for c in pipe.comparers]
    ).collect()
    print(f"full compare: {time.time() - t0:.2f}s", flush=True)

    spark.stop()
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
