"""Isolated timing of the structural bench stages (guide §1.4: noop
sink so we time the computation, not the sink) plus sub-piece splits.

Usage: python scripts/profile_struct.py [sf_dir] [stage ...]
Stages: one_to_one center canopy pivot clk pagerank jw_probe edges
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from mismo_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
STAGES = sys.argv[2:] or ["one_to_one", "center", "canopy", "pivot", "clk", "pagerank"]
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark(
        "profile_struct",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS) * 2, 8),
    )
    sc = spark.sparkContext
    import __spark_entry__ as entry

    qs = entry.queries()

    def timed(tag, fn):
        sc.setJobDescription(tag)
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        print(f"{tag:36s} {dt:8.3f}s", flush=True)
        sc.setJobDescription(None)
        return out

    # warmup: JIT + arrow path
    timed("warmup: jw probe 150k", lambda: _jw_probe(spark, int(CPUS)))

    if "jw_probe" in STAGES:
        timed("jw_probe 150k pairs", lambda: _jw_probe(spark, int(CPUS)))
        timed("jw_probe 150k pairs (2nd)", lambda: _jw_probe(spark, int(CPUS)))

    for name, key in [
        ("one_to_one", "one_to_one_match"),
        ("center", "center_clustering"),
        ("canopy", "canopy_assign"),
        ("pivot", "pivot_clustering"),
        ("clk", "clk_dice_pairs"),
        ("pagerank", "pagerank"),
    ]:
        if name not in STAGES:
            continue
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        try:
            timed(f"{name} (full query, count)", lambda k=key: qs[k](spark, SF_DIR).count())
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "false")

    if "edges" in STAGES:
        # sub-pieces: the scored-edge relations the iterative ops consume
        from mismo_spark.linker.key import KeyLinker
        from mismo_spark.sets.compare import jaccard
        from mismo_spark.text.features import tokenize
        from mismo_spark.text.similarity import jaro_winkler_similarity
        from mismo_spark.types.linkage import Linkage

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
            "record_id", F.col("doc_id")
        )
        d1 = docs.select(
            "record_id", "lang", "source", F.substring("text", 1, 30).alias("prefix")
        )
        lk = KeyLinker(["lang", "source"], task="dedupe")(d1)
        pairs = Linkage(d1, d1, lk.links).links_with_both()
        scored = pairs.select(
            "record_id_l",
            "record_id_r",
            jaro_winkler_similarity(F.col("prefix_l"), F.col("prefix_r")).alias("jw"),
        )
        timed("jw-scored edges (one_to_one/center)", lambda: noop(scored))

        d2 = docs.select(
            "record_id",
            "source",
            F.array_distinct(tokenize(F.lower(F.col("text")))).alias("tokens"),
        )
        lk2 = KeyLinker(["source"], task="dedupe")(d2)
        pairs2 = Linkage(d2, d2, lk2.links).links_with_both()
        edges2 = pairs2.select(
            "record_id_l",
            "record_id_r",
            jaccard(F.col("tokens_l"), F.col("tokens_r")).alias("sim"),
        ).filter(F.col("sim") >= 0.3)
        timed("jaccard edges >=0.3 (canopy)", lambda: noop(edges2))
        timed("jaccard edges again (pivot .6)", lambda: noop(edges2.filter(F.col("sim") >= 0.6)))

    spark.stop()


def _jw_probe(spark, n_cores: int, n_pairs: int = 150_000) -> float:
    from mismo_spark.text.similarity import _jw_udf

    df = spark.range(n_pairs, numPartitions=n_cores).select(
        F.concat(F.lit("/a/"), F.md5(F.col("id").cast("string"))).alias("a"),
        F.concat(F.lit("/a/"), F.md5((F.col("id") + 1).cast("string"))).alias("b"),
    )
    df.select(_jw_udf(F.col("a"), F.col("b")).alias("jw")).agg(F.sum("jw")).collect()


if __name__ == "__main__":
    main()
