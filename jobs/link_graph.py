"""spark-submit entry point: build the link graph of a web-page table
and rank pages (PageRank, or TrustRank given a seed table).

Usage (cluster):
    zip -r mismo_spark.zip mismo_spark
    spark-submit --py-files mismo_spark.zip jobs/link_graph.py \
        --input  s3://bucket/pages/          # parquet/Iceberg (url, html)
        --output s3://bucket/ranks/          # (node, rank) or per --mode
        --mode pagerank --n-iter 10

Sandbox smoke:
    spark-submit --master 'local[8]' --py-files mismo_spark.zip \
        jobs/link_graph.py --input /tmp/pages.parquet \
        --output /tmp/ranks.parquet --mode pagerank

Modes: ``outlinks`` writes the raw (url, outlink) edge list;
``degrees`` writes (node, out_degree, in_degree); ``pagerank`` writes
(node, rank) — pass ``--seeds`` (a (node, weight) parquet) for the
personalized / TrustRank variant that demotes link clusters
unreachable from the trusted seed set; ``hits`` writes
(node, hub, authority).  ``--contract-hosts`` first collapses the page
graph to registrable-domain edges with link-count weights (the scale
move at 10^12 pages: ~10^7 host nodes) and ranks hosts with the
weighted walk.
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="parquet path of pages (url, html)")
    ap.add_argument("--output", required=True, help="output parquet path")
    ap.add_argument(
        "--mode",
        choices=("outlinks", "degrees", "pagerank", "hits", "reciprocity"),
        default="pagerank",
    )
    ap.add_argument(
        "--contract-hosts", action="store_true",
        help="collapse page edges to the registrable-domain graph "
        "(link-count weights) before ranking; pagerank then runs the "
        "weighted walk over hosts",
    )
    ap.add_argument("--url-column", default="url")
    ap.add_argument("--html-column", default="html")
    ap.add_argument("--n-iter", type=int, default=10)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument(
        "--seeds", default=None,
        help="optional (node, weight) parquet: personalized PageRank / "
        "TrustRank teleport restricted to these pages",
    )
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    # master/executors come from spark-submit; only job-level tuning here
    spark = (
        SparkSession.builder.appName("mismo_spark_link_graph")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )

    from mismo_spark.graph import (
        degrees,
        extract_outlinks,
        hits,
        host_graph,
        pagerank,
        reciprocity,
    )

    pages = spark.read.parquet(args.input)
    edges = extract_outlinks(
        pages, url_column=args.url_column, html_column=args.html_column
    )
    src_col, dst_col, weight_col = "url", "outlink", None
    if args.contract_hosts:
        edges = host_graph(edges, src_column="url", dst_column="outlink")
        src_col, dst_col, weight_col = "src", "dst", "weight"
    if args.mode == "outlinks":
        out = edges
    elif args.mode == "degrees":
        out = degrees(edges, src_column=src_col, dst_column=dst_col)
    elif args.mode == "hits":
        out = hits(
            edges, n_iter=args.n_iter, src_column=src_col, dst_column=dst_col
        )
    elif args.mode == "reciprocity":
        out = reciprocity(edges, src_column=src_col, dst_column=dst_col)
    else:
        seeds = spark.read.parquet(args.seeds) if args.seeds else None
        if seeds is not None and args.contract_hosts:
            # the graph's nodes are registrable domains now — map the
            # page-URL seed nodes through the same contraction (summing
            # weights per host), else the teleport join hits nothing
            from pyspark.sql import functions as F

            from mismo_spark.lib.url import registrable_domain

            seeds = (
                seeds.select(
                    registrable_domain(F.col("node")).alias("node"),
                    F.col("weight"),
                )
                .filter(F.col("node").isNotNull())
                .groupBy("node")
                .agg(F.sum("weight").alias("weight"))
            )
        out = pagerank(
            edges,
            n_iter=args.n_iter,
            damping=args.damping,
            src_column=src_col,
            dst_column=dst_col,
            teleport=seeds,
            weight_column=weight_col,
        )
    out.write.mode("overwrite").parquet(args.output)

    # no spark.stop(): spark-submit tears the JVM down at process exit,
    # and in-process tests share the session via getOrCreate
    n = spark.read.parquet(args.output).count()
    print(json.dumps({"output": args.output, "mode": args.mode, "rows": n}))


if __name__ == "__main__":
    main(sys.argv[1:])
