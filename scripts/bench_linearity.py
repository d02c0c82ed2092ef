"""Per-stage data-linearity evidence: the eleven flagship bench stages
at 1× and ~4× input in ONE session, wall-vs-rows per stage.

The 100 TB claim needs every stage's cost to grow at most linearly in
its input.  This harness runs each stage twice — same session, same
plans, spin-calibration bracketing like bench.py — and reports the
wall ratio against the input factor:

* corpus stages (block, compare, em_train, score, cluster_cc,
  docs_textqa, edit_distance): the deterministic page corpus at N and
  4N entities (same generator → duplicate/near-dup structure scales
  linearly by construction);
* documents stages (docs_minhash_dedupe, dsir_select): the sf
  documents table vs 4 id-shifted copies whose texts are
  shingle-SALTED (a per-copy, per-doc salt token after every word) so
  copies are NOT near-duplicates of each other — naive duplication
  would quadruple cross-copy near-dup output and fake superlinearity;
* embeddings stages (cosine_topk, semdedup): 4 id-shifted copies with
  a tiny deterministic per-copy perturbation for the same reason.

A stage is flagged superlinear when wall_big/wall_small exceeds
factor × 1.35 (the slack absorbs fixed per-job scheduling overhead and
host-weather jitter; the bracketing calibrations are in the artifact
for adjudication).

Usage: python scripts/bench_linearity.py [--entities 30000] [--cpus 32]
       [--sf-dir /root/testdata/sf0.1]
Prints ONE JSON line (BENCH_scaling_r5.json material).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pyspark.sql import functions as F

from bench_scaling import _calibrate


def salted_docs(docs, n_copies: int):
    """Union ``n_copies`` id-shifted copies of the documents table with
    a BIJECTIVE per-copy token renaming (every word prefixed with the
    copy tag).  Within a copy, every token-level similarity (shingle
    Jaccard, minhash, TF) is preserved EXACTLY — the copy's near-dup
    structure equals the original's — while across copies no token is
    shared, so duplication cannot fabricate cross-copy near-dups.
    (A first attempt salted by APPENDING a shared token after every
    word; that collapses 2-shingles into word-set markers and made
    unrelated docs near-dups — renaming is the correct construction.)"""
    parts = []
    for k in range(n_copies):
        tag = F.lit(f"c{k}")
        parts.append(
            docs.select(
                (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda w: F.concat(tag, w),
                    ),
                    " ",
                ).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def perturbed_embeddings(emb, n_copies: int):
    """Union ``n_copies`` id-shifted copies, each with a per-copy
    dimension ROTATION — a bijective isometry, so every within-copy
    cosine/norm is preserved exactly (each copy's ANN/semdedup
    structure equals the original's) while cross-copy cosines are
    decorrelated.  (A tiny additive perturbation is NOT enough: copies
    of the same vector stay at cosine ≈ 1 and semdedup would spend its
    time deduplicating the copies against each other.)"""
    parts = []
    for k in range(n_copies):
        if k == 0:
            e = emb.select("*")
        else:
            dim = len(emb.select("embedding").first()["embedding"])
            r = (k * 7 + 3) % dim
            e = emb.select(
                "vec_id",
                F.concat(
                    F.slice(F.col("embedding"), r + 1, dim - r),
                    F.slice(F.col("embedding"), 1, r),
                ).alias("embedding"),
                *[c for c in emb.columns if c not in ("vec_id", "embedding")],
            )
        parts.append(
            e.select(
                (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
                *[c for c in e.columns if c != "vec_id"],
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_stages(
    spark, pages, docs, emb, timings: dict, extras: dict, tag: str,
    n_centroids: int = 8,
):
    """The eleven bench.py stage bodies, parameterized by input.

    ``n_centroids`` must scale with the embeddings count (k ∝ n): with
    a FIXED centroid count, SemDeDup's within-cell pairwise stage is
    quadratic by definition (4× rows per cell → 16× pairs) — the scale
    deployment grows k with the corpus precisely to keep expected cell
    size constant, and this harness models that."""
    from mismo_spark.ann import cosine_topk
    from mismo_spark.ann.semdedup import seed_centroids, semdedup
    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.compare.enum import compare
    from mismo_spark.dedupe import minhash_near_duplicates
    from mismo_spark.pipeline import DedupePipeline, pair_features
    from mismo_spark.text.edjoin import edit_distance_pairs
    from mismo_spark.textqa import fingerprint, lang_id, quality_score
    from mismo_spark.textqa.dsir import dsir_select
    from mismo_spark.textqa.repetition import (
        dup_line_char_fraction,
        dup_line_fraction,
        ngram_repetition_signals,
    )
    from mismo_spark.types.linkage import Linkage

    tmp = tempfile.mkdtemp(prefix=f"mismo_lin_{tag}_")
    pipe = DedupePipeline(work_dir=os.path.join(tmp, "wk"), checkpoint=False, seed=42)
    records = pipe.prepare_records(pages.drop("label_true")).persist()
    extras[f"pages_{tag}"] = records.count()
    extras[f"docs_{tag}"] = docs.count()
    extras[f"emb_{tag}"] = emb.count()

    n_cores = int(spark.sparkContext.master.split("[")[1].rstrip("]"))
    # same nominal-per-core floor and retry discipline as bench.py: a
    # stage bracketed by an off-nominal calibration is re-run once,
    # keeping the discarded timing in the artifact
    floor = 0.7 * 18.0 * n_cores

    def timed(name, fn):
        for attempt in range(2):
            pre = _calibrate(n_cores)[f"cal_{n_cores}core_mups"]
            t0 = time.time()
            fn()
            dt = time.time() - t0
            post = _calibrate(n_cores)[f"cal_{n_cores}core_mups"]
            extras[f"cal_{name}_{tag}_pre_mups"] = pre
            extras[f"cal_{name}_{tag}_post_mups"] = post
            if min(pre, post) >= floor or attempt == 1:
                timings[f"{name}_{tag}"] = round(dt, 3)
                return
            extras[f"{name}_{tag}_discarded_sec"] = round(dt, 3)

    state = {}

    def run_block():
        # unpersist a previous attempt's cache FIRST: a weather retry
        # would otherwise hit the CacheManager (same logical plan) and
        # time a cache read instead of the stage
        if "links" in state:
            state["links"].unpersist()
        links = pipe.blocker()(records, records).links.persist()
        state["n_candidates"] = links.count()
        state["links"] = links

    timed("block", run_block)
    extras[f"candidates_{tag}"] = state["n_candidates"]

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
        ).persist()
        state["n_compared"] = compared.count()
        state["compared"] = compared

    timed("compare", run_compare)
    extras[f"compared_{tag}"] = state["n_compared"]

    timed("em_train", lambda: state.update(weights=pipe._train_weights(state["compared"])))

    def run_score():
        if "scored" in state:
            state["scored"].unpersist()
        scored = (
            state["weights"]
            .score_compared(state["compared"])
            .select("record_id_l", "record_id_r", "odds")
            .persist()
        )
        state["n_scored"] = scored.count()
        state["scored"] = scored

    timed("score", run_score)

    def run_cc():
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

    timed("cluster_cc", run_cc)

    timed(
        "docs_minhash_dedupe",
        lambda: state.update(
            n_neardup=minhash_near_duplicates(
                docs, shingle_size=2, band_size=2, n_bands=8, min_jaccard=0.3
            ).count()
        ),
    )
    extras[f"neardup_{tag}"] = state["n_neardup"]

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
            .agg(F.count(F.lit(1)), F.sum("q"), F.sum("dlf"), F.sum("top_ngram_char_frac"))
            .collect()[0][0]
        )

    timed("docs_textqa", run_textqa)

    timed(
        "cosine_topk",
        lambda: state.update(n_topk=cosine_topk(emb, emb.limit(100), k=10).count()),
    )

    def run_semdedup():
        allv = emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        cents = seed_centroids(allv, n_centroids)
        state["n_sd"] = (
            semdedup(allv, cents, min_cosine=0.95).filter(F.col("keep")).count()
        )

    timed("semdedup", run_semdedup)
    extras[f"semdedup_kept_{tag}"] = state["n_sd"]
    extras[f"semdedup_centroids_{tag}"] = n_centroids

    timed(
        "dsir_select",
        lambda: state.update(
            n_dsir=dsir_select(docs, docs.limit(200), k=500, n_buckets=10_000).count()
        ),
    )

    def run_edjoin():
        names = pages.select(
            F.col("url").alias("record_id"),
            F.substring(F.col("text"), 1, 24).alias("name"),
        )
        state["n_ed"] = edit_distance_pairs(names, "name", max_distance=1, q="auto").count()

    timed("edit_distance", run_edjoin)
    extras[f"edit_distance_pairs_{tag}"] = state["n_ed"]
    extras[f"topk_rows_{tag}"] = state["n_topk"]
    extras[f"components_{tag}"] = state["n_components"]

    for df in (records, state["links"], state["compared"], state["scored"]):
        df.unpersist()
    shutil.rmtree(tmp, ignore_errors=True)


STAGES = [
    ("block", "corpus"),
    ("compare", "corpus"),
    ("em_train", "corpus"),
    ("score", "corpus"),
    ("cluster_cc", "corpus"),
    ("docs_minhash_dedupe", "docs"),
    ("docs_textqa", "corpus"),
    ("cosine_topk", "emb"),
    ("semdedup", "emb"),
    ("dsir_select", "docs"),
    ("edit_distance", "corpus"),
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--entities", type=int, default=30000)
    ap.add_argument("--factor", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    ))
    ap.add_argument("--slack", type=float, default=1.35)
    args = ap.parse_args()

    from mismo_spark.corpus import make_corpus
    from mismo_spark.session import get_spark

    spark = get_spark(
        "bench_linearity",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus * 2,
        extra_conf={"spark.sql.adaptive.enabled": "false"},
    )

    tmp = tempfile.mkdtemp(prefix="mismo_linearity_")
    p1 = os.path.join(tmp, "corpus1.parquet")
    p4 = os.path.join(tmp, "corpus4.parquet")
    make_corpus(
        spark, args.entities, seed=42, skew_every=2000, n_partitions=args.cpus * 2
    ).write.mode("overwrite").parquet(p1)
    make_corpus(
        spark,
        args.entities * args.factor,
        seed=42,
        skew_every=2000,
        n_partitions=args.cpus * 2,
    ).write.mode("overwrite").parquet(p4)

    docs1 = spark.read.parquet(f"{args.sf_dir}/documents.parquet").withColumn(
        "record_id", F.col("doc_id")
    )
    emb1 = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    d4 = os.path.join(tmp, "docs4.parquet")
    e4 = os.path.join(tmp, "emb4.parquet")
    salted_docs(docs1.drop("record_id"), args.factor).write.mode("overwrite").parquet(d4)
    perturbed_embeddings(emb1, args.factor).write.mode("overwrite").parquet(e4)
    docs4 = spark.read.parquet(d4).withColumn("record_id", F.col("doc_id"))
    emb4 = spark.read.parquet(e4)

    timings: dict = {}
    extras: dict = {}

    # warmup: JIT + page-fault the working set once (small corpus pass)
    t0 = time.time()
    run_stages(spark, spark.read.parquet(p1).limit(5000), docs1.limit(500),
               emb1.limit(500), {}, {}, "warmup")
    extras["warmup_sec"] = round(time.time() - t0, 3)

    run_stages(spark, spark.read.parquet(p1), docs1, emb1, timings, extras, "1x",
               n_centroids=8)
    run_stages(spark, spark.read.parquet(p4), docs4, emb4, timings, extras, "4x",
               n_centroids=8 * args.factor)

    stages_out = {}
    any_super = False
    for name, family in STAGES:
        w1, w4 = timings[f"{name}_1x"], timings[f"{name}_4x"]
        ratio = round(w4 / w1, 2) if w1 > 0 else None
        superlinear = ratio is not None and ratio > args.factor * args.slack
        any_super = any_super or superlinear
        stages_out[name] = {
            "wall_1x": w1,
            "wall_4x": w4,
            "ratio": ratio,
            "input_family": family,
            "input_factor": args.factor,
            "superlinear": superlinear,
        }

    print(
        json.dumps(
            {
                "metric": "per_stage_linearity",
                "factor": args.factor,
                "slack": args.slack,
                "stages": stages_out,
                "any_superlinear": any_super,
                **extras,
            }
        )
    )
    spark.stop()
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
