"""Benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} plus throughput extras
(candidate_pairs_per_sec — the BASELINE.json headline metric).

The flagship workload is the full dedupe pipeline over a deterministic
synthetic web-page corpus (mismo has no TPC-style suite; its benchmarks
are blocking pair-counts — ours cover blocking, comparison, scoring and
clustering).  Corpus generation happens once, outside the timers, into
a temp parquet.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from mismo_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_ENTITIES = int(os.environ.get("BENCH_N_ENTITIES", "30000"))


def _calibrate_and_wait(extras: dict, *, min_cal_per_core: float, max_wait: int) -> None:
    """The sandbox host's delivered CPU has multi-minute ~10× slow
    phases (see BENCH_scaling.json / scripts/bench_scaling.py).  Wait
    (bounded) for near-nominal CPU, and record the spin calibration so
    the recorded timings carry their own weather context."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from bench_scaling import _calibrate

    n = int(CPUS)
    deadline = time.time() + max_wait
    while True:
        cal = _calibrate(n)
        per_core = cal[f"cal_{n}core_mups"] / n
        if per_core >= min_cal_per_core or time.time() >= deadline:
            extras.update(cal)
            return
        time.sleep(20)


def main() -> None:
    spark = get_spark(
        "mismo_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS) * 2, 8),
    )
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    _calibrate_and_wait(
        extras,
        min_cal_per_core=float(os.environ.get("BENCH_MIN_CAL_PER_CORE", "18")),
        max_wait=int(os.environ.get("BENCH_MAX_WEATHER_WAIT", "300")),
    )

    # ---- corpus setup (untimed) ----------------------------------------
    from mismo_spark.corpus import make_corpus

    tmp = tempfile.mkdtemp(prefix="mismo_bench_")
    corpus_path = os.path.join(tmp, "corpus.parquet")
    t0 = time.time()
    make_corpus(
        spark, N_ENTITIES, seed=42, skew_every=2000, n_partitions=int(CPUS) * 2
    ).write.mode("overwrite").parquet(corpus_path)
    extras["corpus_setup_sec"] = round(time.time() - t0, 3)
    pages = spark.read.parquet(corpus_path)
    n_pages = pages.count()
    extras["corpus_pages"] = n_pages

    from mismo_spark.pipeline import DedupePipeline, pair_features
    from mismo_spark.types.linkage import Linkage
    from mismo_spark.compare.enum import compare

    pipe = DedupePipeline(work_dir=os.path.join(tmp, "wk"), checkpoint=False, seed=42)
    records = pipe.prepare_records(pages.drop("label_true"))
    records.persist()
    records.count()

    # ---- warmup (untimed): one full block+compare execution ------------
    # JIT-compiles the generated code and faults in working-set pages so
    # the timed sections measure steady state (executors on a real
    # cluster are long-lived); see BASELINE.md measurement notes.
    t0 = time.time()
    _wlinks = pipe.blocker()(records, records).links
    _wnarrow = records.select(
        "record_id", "path", "prefix", "text_fp", "tok_hashes", "shingle_hashes"
    )
    _wpairs = Linkage(_wnarrow, _wnarrow, _wlinks).links_with_both(
        broadcast_records=True
    )
    compare(pair_features(_wpairs), pipe.comparers).agg(
        F.count(F.lit(1)), *[F.sum(c.name) for c in pipe.comparers]
    ).collect()
    extras["warmup_sec"] = round(time.time() - t0, 3)

    # ---- q1: blocking (domain key ∪ minhash LSH) ------------------------
    t0 = time.time()
    links = pipe.blocker()(records, records).links
    links.persist()
    n_candidates = links.count()
    timings["block"] = round(time.time() - t0, 3)
    extras["candidate_pairs"] = n_candidates
    extras["candidate_pairs_per_sec"] = round(n_candidates / timings["block"], 1)

    # ---- q2: comparison vectors ------------------------------------------
    t0 = time.time()
    narrow = records.select(
        "record_id", "path", "prefix", "text_fp", "tok_hashes", "shingle_hashes"
    )
    pairs = Linkage(narrow, narrow, links).links_with_both(broadcast_records=True)
    compared = compare(pair_features(pairs), pipe.comparers).select(
        "record_id_l", "record_id_r", *[c.name for c in pipe.comparers]
    )
    compared.persist()
    n_compared = compared.count()
    timings["compare"] = round(time.time() - t0, 3)
    extras["compared_pairs_per_sec"] = round(n_compared / timings["compare"], 1)

    # ---- q3: EM weight estimation (agreement-pattern aggregation loop) ---
    t0 = time.time()
    weights = pipe._train_weights(compared)
    timings["em_train"] = round(time.time() - t0, 3)

    # ---- q4: FS scoring ----------------------------------------------------
    t0 = time.time()
    scored = weights.score_compared(compared).select(
        "record_id_l", "record_id_r", "odds"
    )
    scored.persist()
    n_scored = scored.count()
    timings["score"] = round(time.time() - t0, 3)
    extras["scored_pairs_per_sec"] = round(n_scored / timings["score"], 1)

    # ---- q3: threshold + connected components ---------------------------
    t0 = time.time()
    from mismo_spark.cluster.cc import connected_components

    matches = scored.filter(F.col("odds") >= 10.0).select(
        "record_id_l", "record_id_r"
    )
    comps = connected_components(
        matches, records.select("record_id"), algorithm="star"
    )
    n_components = comps.select("component").distinct().count()
    timings["cluster_cc"] = round(time.time() - t0, 3)
    extras["n_components"] = n_components

    # ---- q4: documents minhash near-dup (sf table) -----------------------
    t0 = time.time()
    from mismo_spark.dedupe import minhash_near_duplicates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "record_id", F.col("doc_id")
    )
    n_neardup = minhash_near_duplicates(
        docs, shingle_size=2, band_size=2, n_bands=8, min_jaccard=0.3
    ).count()
    timings["docs_minhash_dedupe"] = round(time.time() - t0, 3)
    extras["docs_neardup_pairs"] = n_neardup

    # ---- q5: embeddings cosine top-k -------------------------------------
    t0 = time.time()
    from mismo_spark.ann import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cosine_topk(emb, emb.limit(100), k=10).count()
    timings["cosine_topk"] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "dedupe_pipeline_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR,
                **extras,
            }
        )
    )
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
