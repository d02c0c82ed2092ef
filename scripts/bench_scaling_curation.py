"""Scaling-efficiency evidence #2 — the CURATION side of the engine.

`bench_scaling.py` evidences the north rule's N→4N criterion on the
record-linkage stages (block + compare).  This script applies the
identical protocol (fresh pinned JVM per run, warmup pass, spin
calibrations, interleaved configs, best-of-N) to the map/agg-heavy
curation stages a training-data pipeline runs on every page:

* **textqa sweep** — quality score, language id, fingerprint, dup-line
  fractions AND the n-gram repetition signals in one pass;
* **minhash near-dup detection** — shingle → signature → band join →
  Jaccard recheck over the full corpus.

Throughput metric is pages/sec over the two stages combined;
``eff = (pages_per_sec @ 4N) / (4 × pages_per_sec @ N)``.

Usage: python scripts/bench_scaling_curation.py [--entities 100000]
       [--runs 2] [--low 8] [--high 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_scaling import _calibrate  # noqa: E402  (shared weather probe)


def _run_job(spark, pages) -> tuple[int, float, float]:
    """One full textqa + minhash execution with fresh plans; returns
    (n_pages, textqa_sec, minhash_sec)."""
    from pyspark.sql import functions as F

    from mismo_spark.dedupe import minhash_near_duplicates
    from mismo_spark.textqa import fingerprint, lang_id, quality_score
    from mismo_spark.textqa.repetition import (
        dup_line_char_fraction,
        dup_line_fraction,
        ngram_repetition_signals,
    )

    t = F.col("text")
    t0 = time.time()
    line_side = pages.select(
        F.col("url"),
        quality_score(t).alias("q"),
        lang_id(t).alias("lang"),
        fingerprint(t).alias("fp"),
        dup_line_fraction(t).alias("dlf"),
        dup_line_char_fraction(t).alias("dlcf"),
    )
    gram_side = ngram_repetition_signals(
        pages.select("url", "text"), n=2, id_col="url", text_col="text"
    )
    n_pages = (
        line_side.join(gram_side, "url")
        .agg(
            F.count(F.lit(1)),
            F.sum("q"),
            F.sum("dlf"),
            F.sum("dlcf"),
            F.sum("top_ngram_char_frac"),
            F.sum("dup_ngram_char_frac"),
        )
        .collect()[0][0]
    )
    textqa_sec = time.time() - t0

    docs = pages.withColumn("record_id", F.col("url"))
    t0 = time.time()
    minhash_near_duplicates(
        docs, shingle_size=2, band_size=2, n_bands=8, min_jaccard=0.3
    ).count()
    minhash_sec = time.time() - t0
    return n_pages, textqa_sec, minhash_sec


def run_once_inprocess(corpus_path: str, cpus: int) -> dict:
    from mismo_spark.session import get_spark

    spark = get_spark(
        f"curation_scaling_{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus * 2,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    try:
        pages = spark.read.parquet(corpus_path)
        _run_job(spark, pages)  # warmup: JIT + page faults, untimed
        cal = _calibrate(cpus)
        n_pages, textqa_sec, minhash_sec = _run_job(spark, pages)
        total = textqa_sec + minhash_sec
        out = {
            "cpus": cpus,
            "pages": n_pages,
            "textqa_sec": round(textqa_sec, 3),
            "minhash_sec": round(minhash_sec, 3),
            "total_sec": round(total, 3),
            "pages_per_sec": round(n_pages / total, 1),
        }
        out.update(cal)
        return out
    finally:
        spark.stop()


def run_once(corpus_path: str, cpus: int, pin: bool) -> dict:
    cmd = []
    if pin:
        cmd += ["taskset", "-c", f"0-{cpus - 1}"]
    cmd += [sys.executable, os.path.abspath(__file__), "--single", corpus_path, str(cpus)]
    env = dict(os.environ)
    env.setdefault("MISMO_SPARK_DRIVER_MEM", "12g")
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=REPO, timeout=3600, env=env
    )
    if out.returncode != 0:
        raise RuntimeError(f"run cpus={cpus} failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=100000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--no-taskset", action="store_true")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_scaling_curation.json"))
    ap.add_argument("--single", nargs=2, metavar=("CORPUS", "CPUS"))
    args = ap.parse_args()

    if args.single:
        print(json.dumps(run_once_inprocess(args.single[0], int(args.single[1]))))
        return

    pin = not args.no_taskset and shutil.which("taskset") is not None

    # corpus generated once, identical at any parallelism
    from mismo_spark.corpus import make_corpus
    from mismo_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="curation_scaling_")
    try:
        corpus_path = os.path.join(tmp, "corpus.parquet")
        spark = get_spark("curation_scaling_gen", master="local[32]")
        make_corpus(
            spark, args.entities, seed=42, skew_every=2000, n_partitions=64
        ).write.mode("overwrite").parquet(corpus_path)
        spark.stop()

        runs: list[dict] = []
        for i in range(args.runs):  # interleaved: same weather for both configs
            for cpus in (args.low, args.high):
                r = run_once(corpus_path, cpus, pin)
                r["run"] = i
                runs.append(r)
                print(json.dumps(r), flush=True)

        best = {
            c: max(
                (r for r in runs if r["cpus"] == c),
                key=lambda r: r["pages_per_sec"],
            )
            for c in (args.low, args.high)
        }
        eff = best[args.high]["pages_per_sec"] / (
            (args.high / args.low) * best[args.low]["pages_per_sec"]
        )
        result = {
            "metric": "curation_scaling_efficiency",
            "value": round(eff, 3),
            "unit": "ratio",
            "low": best[args.low],
            "high": best[args.high],
            "factor": args.high / args.low,
            "pinned": pin,
            "all_runs": runs,
        }
        print(json.dumps(result))
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    finally:
        # a failed subprocess run must not leak the multi-GB corpus
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
