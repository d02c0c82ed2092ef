"""spark-submit entry point: LINK two web-page tables (the two-table
record-linkage task, vs jobs/dedupe_webpages.py's self-dedupe).

    spark-submit --py-files mismo_spark.zip jobs/link_records.py \\
        --left new_crawl.parquet --right corpus.parquet \\
        --output links.parquet [--weights-json w.json]
        [--best-match-only | --one-to-one] [--threshold-odds 10]

Flow: prepare records on both sides (same derivation as the dedupe
pipeline — byte-identical text extraction per url) → blocking with
``task='link'`` (domain equi-join ∪ minhash-LSH band join) → one Arrow
pass of pairwise features → Fellegi-Sunter scoring (provided weights,
or EM trained on the compared pairs) → odds threshold → optionally keep
only each left record's best match.  Output:
(record_id_l, record_id_r, odds).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--left", required=True, help="parquet of pages to link FROM")
    ap.add_argument("--right", required=True, help="parquet of pages to link INTO")
    ap.add_argument("--output", required=True)
    ap.add_argument("--threshold-odds", type=float, default=10.0)
    ap.add_argument("--weights-json", default=None, help="pre-trained weights (skip EM)")
    ap.add_argument("--max-pairs-per-key", type=int, default=100_000)
    ap.add_argument("--skew-split-pairs", type=int, default=None)
    ap.add_argument("--lsh-band-size", type=int, default=2)
    ap.add_argument("--lsh-n-bands", type=int, default=32)
    ap.add_argument("--em-max-pairs", type=int, default=200_000)
    ap.add_argument("--best-match-only", action="store_true",
                    help="keep only each left record's max-odds link")
    ap.add_argument("--one-to-one", action="store_true",
                    help="enforce a 1:1 matching: greedy maximum-weight "
                    "assignment by descending odds (linker/assignment.py); "
                    "mutually exclusive with --best-match-only")
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.appName("mismo_spark_link_records")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from mismo_spark.compare.enum import compare
    from mismo_spark.fs.weights import Weights
    from mismo_spark.linker.key import KeyLinker
    from mismo_spark.linker.lsh import MinhashLshLinker
    from mismo_spark.linker.or_ import OrLinker
    from mismo_spark.pipeline import DedupePipeline, pair_features
    from mismo_spark.types.linkage import Linkage

    pipe = DedupePipeline(work_dir="/tmp/_unused", checkpoint=False, seed=args.seed)
    left = pipe.prepare_records(spark.read.parquet(args.left))
    right = pipe.prepare_records(spark.read.parquet(args.right))
    left.persist(); right.persist()

    blocker = OrLinker(
        track_rules=False,
        linkers={
            "domain": KeyLinker(
                ["domain"],
                task="link",
                max_pairs=args.max_pairs_per_key,
                skew_split=args.skew_split_pairs,
            ),
            "lsh": MinhashLshLinker(
                "shingle_hashes",
                band_size=args.lsh_band_size,
                n_bands=args.lsh_n_bands,
                seed=args.seed,
                task="link",
            ),
        },
    )
    links = blocker(left, right).links

    narrow_cols = ["record_id", "path", "prefix", "text_fp", "tok_hashes", "shingle_hashes"]
    pairs = Linkage(
        left.select(*narrow_cols), right.select(*narrow_cols), links
    ).links_with_both()
    compared = compare(pair_features(pairs), pipe.comparers).select(
        "record_id_l", "record_id_r", *[c.name for c in pipe.comparers]
    )
    compared.persist()
    n_compared = compared.count()

    if args.weights_json:
        weights = Weights.from_json(args.weights_json)
    else:
        # EM over the blocked comparison vectors (same recipe as the
        # dedupe pipeline: bounded hash-filter sample, one joint
        # histogram, driver-side iteration)
        pipe.em_max_pairs = args.em_max_pairs
        weights = pipe._train_weights(compared)

    scored = weights.score_compared(compared).select(
        "record_id_l", "record_id_r", "odds"
    )
    matches = scored.filter(F.col("odds") >= args.threshold_odds)
    if args.one_to_one and args.best_match_only:
        ap.error("--one-to-one and --best-match-only are mutually exclusive")
    if args.one_to_one:
        from mismo_spark.linker.assignment import one_to_one_links

        # explicit bipartite semantics: left and right are DIFFERENT
        # datasets, so a numeric id collision across them must not
        # trigger the shared-id-space (dedupe) auto-detection
        matches = one_to_one_links(matches, "odds", dedupe=False)
    if args.best_match_only:
        from pyspark.sql import Window

        w = Window.partitionBy("record_id_l")
        matches = (
            matches.withColumn("__mx", F.max("odds").over(w))
            .filter(F.col("odds") == F.col("__mx"))
            .drop("__mx")
        )
    matches.write.mode("overwrite").parquet(args.output)
    n_links = spark.read.parquet(args.output).count()
    out = {"output": args.output, "compared_pairs": n_compared, "links": n_links}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main(sys.argv[1:])
