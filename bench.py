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

Weather-proofing: the sandbox host's delivered CPU has multi-minute
~10× slow phases (see BENCH_scaling.json), so EVERY timed stage is
bracketed by spin calibrations (`cal_<stage>_pre/post_mups` in the
output) — a recorded timing carries its own evidence of the CPU it ran
on, and a stage whose bracketing calibrations fall below
~70% of the nominal per-core rate is re-run once (the discarded
timing is kept in the artifact as `<stage>_discarded_sec`).

UDF-heavy stages (compare, cosine_topk, semdedup) are additionally
bracketed by an Arrow-UDF probe (`cal_<stage>_pre/post_udf_kps`): a
fixed 150k-pair Jaro-Winkler batch through the real
job→ArrowEvalPython→python-worker path.  Their retry decision keys off
that probe — round-3 evidence showed the spin cal does NOT track the
fork/IPC-bound UDF path (a 21 s compare was discarded at spin 341
while an 86 s retry passed at spin 864).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))

from pyspark.sql import functions as F

from mismo_spark.session import get_spark
from bench_scaling import _calibrate

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_ENTITIES = int(os.environ.get("BENCH_N_ENTITIES", "30000"))
MIN_CAL_PER_CORE = float(os.environ.get("BENCH_MIN_CAL_PER_CORE", "18"))
# nominal healthy throughput of the Arrow-UDF probe, kpairs/sec PER
# CORE through the full job→ArrowEvalPython→python-worker path
# (measured idle-host at local[32], 150k pairs: ~150-200 kpairs/s
# total ≈ 5-6 k/s/core; the probe deliberately includes the job's
# fixed fork/IPC overhead — that overhead IS the weather signal)
MIN_UDF_KPS_PER_CORE = float(os.environ.get("BENCH_MIN_UDF_KPS_PER_CORE", "3.0"))
# a stage is weather-poisoned (re-run once) when either bracketing
# calibration is below this fraction of the nominal per-core rate
RERUN_CAL_FRACTION = float(os.environ.get("BENCH_RERUN_CAL_FRACTION", "0.7"))
STAGE_RETRIES = int(os.environ.get("BENCH_STAGE_RETRIES", "1"))
UDF_PROBE_PAIRS = int(os.environ.get("BENCH_UDF_PROBE_PAIRS", "150000"))


def _udf_probe_kps(spark, n_cores: int, n_pairs: int = UDF_PROBE_PAIRS) -> float:
    """Time a FIXED workload through the actual pandas-UDF path —
    Spark job → ArrowEvalPython → forked Python workers → Jaro-Winkler
    kernel — and return kpairs/sec.

    The spin calibration measures burst CPU in THIS process only; the
    compare stage's cost lives in fork/IPC/page-cache behaviour of the
    executor's Python UDF workers, which the spin never touches
    (observed: a 21 s compare discarded at spin-cal 341 while an 86 s
    retry passed at 864).  This probe IS that path, so a stage timing
    bracketed by it carries evidence of the weather that matters."""
    from pyspark.sql import functions as F

    from mismo_spark.text.similarity import _jw_udf

    df = spark.range(n_pairs, numPartitions=n_cores).select(
        F.concat(F.lit("/a/"), F.md5(F.col("id").cast("string"))).alias("a"),
        F.concat(
            F.lit("/a/"), F.md5((F.col("id") + 1).cast("string"))
        ).alias("b"),
    )
    t0 = time.time()
    df.select(_jw_udf(F.col("a"), F.col("b")).alias("jw")).agg(
        F.sum("jw")
    ).collect()
    return n_pairs / (time.time() - t0) / 1e3


class StageTimer:
    """Times stages with bracketing calibrations; re-runs a stage once
    when the host's delivered CPU was off-nominal during it.

    Every stage gets spin calibrations (JVM-thread burst CPU).  Stages
    flagged ``udf=True`` ALSO get the Arrow-UDF probe
    (``cal_<stage>_{pre,post}_udf_kps``) and their retry decision keys
    off THAT probe — the spin loop provably does not track the
    fork/IPC-bound Python-worker path those stages live in."""

    def __init__(self, n_cores: int, timings: dict, extras: dict, spark) -> None:
        self.n = n_cores
        self.timings = timings
        self.extras = extras
        self.spark = spark
        self._last_cal: float | None = None  # post-cal chains into next pre-cal
        self._last_udf: float | None = None

    def _cal(self) -> float:
        return _calibrate(self.n)[f"cal_{self.n}core_mups"]

    def run(self, name: str, fn, udf: bool = False) -> None:
        floor = RERUN_CAL_FRACTION * MIN_CAL_PER_CORE * self.n
        udf_floor = RERUN_CAL_FRACTION * MIN_UDF_KPS_PER_CORE * self.n
        for attempt in range(STAGE_RETRIES + 1):
            pre = self._last_cal if self._last_cal is not None else self._cal()
            pre_udf = None
            if udf:
                pre_udf = (
                    self._last_udf
                    if self._last_udf is not None
                    else _udf_probe_kps(self.spark, self.n)
                )
            t0 = time.time()
            fn()
            dt = time.time() - t0
            post = self._cal()
            self._last_cal = post
            self.extras[f"cal_{name}_pre_mups"] = round(pre, 1)
            self.extras[f"cal_{name}_post_mups"] = round(post, 1)
            if udf:
                post_udf = _udf_probe_kps(self.spark, self.n)
                self._last_udf = post_udf
                self.extras[f"cal_{name}_pre_udf_kps"] = round(pre_udf, 1)
                self.extras[f"cal_{name}_post_udf_kps"] = round(post_udf, 1)
                healthy = min(pre_udf, post_udf) >= udf_floor
            else:
                # a UDF probe result is stale evidence for the NEXT
                # udf stage only if nothing ran in between; any
                # non-udf stage invalidates it
                self._last_udf = None
                healthy = min(pre, post) >= floor
            if healthy or attempt == STAGE_RETRIES:
                self.timings[name] = round(dt, 3)
                return
            # poisoned: keep the evidence, re-run fresh
            self.extras[f"{name}_discarded_sec"] = round(dt, 3)
            self._last_cal = None
            self._last_udf = None


def main() -> None:
    spark = get_spark(
        "mismo_spark_bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(int(CPUS) * 2, 8),
        # AQE off for the measured job: every join here is either
        # broadcast or semantically skew-capped (max_pairs), so runtime
        # re-planning buys nothing — but its per-exchange driver
        # barriers cost a measured ~20-25% on these many-exchange plans
        # (A/B'd at local[8]/local[32], see BASELINE.md).  The library
        # default (get_spark) keeps AQE on for cluster runs where
        # sort-merge joins can skew.
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}
    n = int(CPUS)

    # bounded wait for near-nominal CPU before any timing starts
    deadline = time.time() + int(os.environ.get("BENCH_MAX_WEATHER_WAIT", "300"))
    while True:
        cal = _calibrate(n)
        if cal[f"cal_{n}core_mups"] / n >= MIN_CAL_PER_CORE or time.time() >= deadline:
            extras.update(cal)
            break
        time.sleep(20)

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
    extras["corpus_pages"] = pages.count()

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

    timer = StageTimer(n, timings, extras, spark)
    state: dict = {}

    # ---- q1: blocking (domain key ∪ minhash LSH) ------------------------
    def run_block():
        if "links" in state:
            state["links"].unpersist()
        links = pipe.blocker()(records, records).links
        links.persist()
        state["n_candidates"] = links.count()
        state["links"] = links

    timer.run("block", run_block)
    extras["candidate_pairs"] = state["n_candidates"]
    extras["candidate_pairs_per_sec"] = round(
        state["n_candidates"] / timings["block"], 1
    )

    # ---- q2: comparison vectors ------------------------------------------
    def run_compare():
        if "compared" in state:
            state["compared"].unpersist()
        narrow = records.select(
            "record_id", "path", "prefix", "text_fp", "tok_hashes", "shingle_hashes"
        )
        pairs = Linkage(narrow, narrow, state["links"]).links_with_both(
            broadcast_records=True
        )
        compared = compare(pair_features(pairs), pipe.comparers).select(
            "record_id_l", "record_id_r", *[c.name for c in pipe.comparers]
        )
        compared.persist()
        state["n_compared"] = compared.count()
        state["compared"] = compared

    timer.run("compare", run_compare, udf=True)
    extras["compared_pairs_per_sec"] = round(
        state["n_compared"] / timings["compare"], 1
    )

    # ---- q3: EM weight estimation (agreement-pattern aggregation loop) ---
    def run_em():
        state["weights"] = pipe._train_weights(state["compared"])

    timer.run("em_train", run_em)

    # ---- q4: FS scoring ----------------------------------------------------
    def run_score():
        if "scored" in state:
            state["scored"].unpersist()
        scored = state["weights"].score_compared(state["compared"]).select(
            "record_id_l", "record_id_r", "odds"
        )
        scored.persist()
        state["n_scored"] = scored.count()
        state["scored"] = scored

    timer.run("score", run_score)
    extras["scored_pairs_per_sec"] = round(state["n_scored"] / timings["score"], 1)

    # ---- q5: threshold + connected components ---------------------------
    from mismo_spark.cluster.cc import connected_components

    def run_cc():
        # CC is the one stage where AQE pays here: its per-round
        # shuffles shrink geometrically, and runtime coalescing keeps
        # late rounds from scheduling 64 near-empty tasks each
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        try:
            matches = state["scored"].filter(F.col("odds") >= 10.0).select(
                "record_id_l", "record_id_r"
            )
            comps = connected_components(
                matches, records.select("record_id"), algorithm="star"
            )
            state["n_components"] = comps.select("component").distinct().count()
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "false")

    timer.run("cluster_cc", run_cc)
    extras["n_components"] = state["n_components"]

    # ---- q6: documents minhash near-dup (sf table) -----------------------
    from mismo_spark.dedupe import minhash_near_duplicates

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
        "record_id", F.col("doc_id")
    )

    def run_minhash():
        state["n_neardup"] = minhash_near_duplicates(
            docs, shingle_size=2, band_size=2, n_bands=8, min_jaccard=0.3
        ).count()

    timer.run("docs_minhash_dedupe", run_minhash)
    extras["docs_neardup_pairs"] = state["n_neardup"]

    # ---- q6b: text QA sweep over the full page corpus --------------------
    # quality + lang-id + fingerprint + Gopher repetition signals in one
    # pass over 85k pages: the map-heavy stage of a curation funnel
    from mismo_spark.textqa import fingerprint, lang_id, quality_score
    from mismo_spark.textqa.repetition import (
        dup_line_char_fraction,
        dup_line_fraction,
        ngram_repetition_signals,
    )

    def run_textqa():
        t = F.col("text")
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
        state["textqa_rows"] = (
            line_side.join(gram_side, "url")
            .agg(
                F.count(F.lit(1)),
                F.sum("q"),
                F.sum("dlf"),
                F.sum("top_ngram_char_frac"),
            )
            .collect()[0][0]
        )

    timer.run("docs_textqa", run_textqa)
    extras["textqa_pages"] = state["textqa_rows"]

    # ---- q7: embeddings cosine top-k -------------------------------------
    from mismo_spark.ann import cosine_topk

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

    def run_topk():
        state["n_topk"] = cosine_topk(emb, emb.limit(100), k=10).count()

    timer.run("cosine_topk", run_topk, udf=True)

    # ---- q8: SemDeDup over the embeddings table --------------------------
    from mismo_spark.ann.semdedup import seed_centroids, semdedup

    def run_semdedup():
        allv = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        cents = seed_centroids(allv, 8)
        state["n_semdedup_kept"] = (
            semdedup(allv, cents, min_cosine=0.95)
            .filter(F.col("keep"))
            .count()
        )

    timer.run("semdedup", run_semdedup, udf=True)
    extras["semdedup_kept"] = state["n_semdedup_kept"]

    # ---- q9: DSIR selection over the documents table ---------------------
    from mismo_spark.textqa.dsir import dsir_select

    def run_dsir():
        state["n_dsir"] = dsir_select(
            docs, docs.limit(200), k=500, n_buckets=10_000
        ).count()

    timer.run("dsir_select", run_dsir)

    # ---- q10: edit-distance join over page URL paths ---------------------
    from mismo_spark.text.edjoin import edit_distance_pairs

    def run_edjoin():
        names = pages.select(
            F.col("url").alias("record_id"),
            F.substring(F.col("text"), 1, 24).alias("name"),
        )
        # q="auto": the 24-char lowercase-prose field has ~10³ distinct
        # 2-grams for ~85k records — the sampled candidate-volume check
        # drives q to 5 (the uniform type-count model alone stopped at
        # 4, whose Zipf-hot prefix buckets ran ~2× the wall)
        state["n_edjoin"] = edit_distance_pairs(
            names, "name", max_distance=1, q="auto"
        ).count()

    timer.run("edit_distance", run_edjoin)
    extras["edit_distance_pairs"] = state["n_edjoin"]

    # the headline value stays the eleven-stage flagship pipeline total
    # (comparable round-over-round); the structural-operator stages
    # below are timed and recorded alongside but summed separately
    flagship_total = round(sum(timings.values()), 3)

    # ---- q11-q16: structural operators (driver-query plans) --------------
    # Each runs the exact oracle-checked query from __spark_entry__ at
    # SF_DIR, so these timings describe the shipped plans.  AQE on for
    # the group: they all iterate with geometrically shrinking
    # relations (dominant-edge rounds, MIS rounds, star rounds), where
    # runtime coalescing prevents late rounds from scheduling dozens of
    # near-empty tasks — the same rationale as run_cc.
    import __spark_entry__ as entry_mod

    struct_queries = entry_mod.queries()

    def run_struct(stage: str, key: str, udf: bool = False) -> None:
        def fn():
            spark.conf.set("spark.sql.adaptive.enabled", "true")
            try:
                state[f"n_{stage}"] = struct_queries[key](spark, SF_DIR).count()
            finally:
                spark.conf.set("spark.sql.adaptive.enabled", "false")

        timer.run(stage, fn, udf=udf)
        extras[f"{stage}_rows"] = state[f"n_{stage}"]

    # JW-scored candidate inputs → Arrow-UDF weather bracketing
    run_struct("one_to_one", "one_to_one_match", udf=True)
    run_struct("center", "center_clustering", udf=True)
    # token-Jaccard / HOF inputs stay JVM-side
    run_struct("canopy", "canopy_assign")
    run_struct("pivot", "pivot_clustering")
    run_struct("clk", "clk_dice_pairs")
    run_struct("pagerank", "pagerank")

    struct_stages = ("one_to_one", "center", "canopy", "pivot", "clk", "pagerank")
    extras["struct_total_sec"] = round(
        sum(timings[s] for s in struct_stages), 3
    )

    print(
        json.dumps(
            {
                "metric": "dedupe_pipeline_total",
                "value": flagship_total,
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
