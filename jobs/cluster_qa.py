"""spark-submit entry point: cluster QA + repair for an accepted-links
table — find the weak bridges welding distinct entities into one
component, and repair the clustering without a full re-run.

Usage (cluster):
    zip -r mismo_spark.zip mismo_spark
    spark-submit --py-files mismo_spark.zip jobs/cluster_qa.py \\
        --links  s3://bucket/links/      # parquet (record_id_l, record_id_r[, odds])
        --output s3://bucket/cluster_qa/ # report + repaired assignment

Sandbox smoke:
    spark-submit --master 'local[8]' --py-files mismo_spark.zip \\
        jobs/cluster_qa.py --links /tmp/links.parquet --output /tmp/qa

The pipeline (one pass, every shuffle keyed by node/component):

  1. ``connected_components`` over the links — the baseline assignment.
  2. ``edge_support`` — per-link triangle count; a link with support 0
     (no third record linked to both endpoints) is structurally
     unsupported.  With ``--odds-column``, only unsupported links whose
     score is also below ``--max-bridge-odds`` are flagged — structure
     AND score both doubting the link.
  3. ``label_propagation`` (or, with ``--splitter pivot``, KwikCluster
     pivot correlation clustering) — community labels; a flagged
     bridge whose endpoints ALSO disagree on their community label is
     a confirmed split suggestion (three independent signals).  The
     report column is named ``lpa_split`` under either splitter.
  4. ``decremental_components`` removes the confirmed bridges and
     re-clusters ONLY the touched components (splits included) —
     byte-identical to a from-scratch CC over the surviving links.

Outputs under --output:
  bridges.parquet     (record_id_l, record_id_r, support, lpa_split[, odds])
  assignment.parquet  repaired (record_id, component)
  and a one-line JSON summary on stdout.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--links", required=True, help="parquet of accepted links")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument(
        "--odds-column", default=None,
        help="optional score column on links; bridges must also score "
        "below --max-bridge-odds to be removed",
    )
    ap.add_argument("--max-bridge-odds", type=float, default=10.0)
    ap.add_argument("--lpa-iter", type=int, default=5)
    ap.add_argument(
        "--splitter", choices=("lpa", "pivot"), default="lpa",
        help="community signal confirming a flagged bridge: synchronous "
        "label propagation (default) or KwikCluster pivot correlation "
        "clustering (cluster/pivot.py — diameter-<=2 clusters, absent "
        "edges count against merging)",
    )
    ap.add_argument(
        "--max-degree", type=int, default=1000,
        help="hub cap for the edge_support wedge join",
    )
    ap.add_argument(
        "--dry-run", action="store_true",
        help="write the bridge report but keep the original assignment",
    )
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from mismo_spark.cluster.cc import connected_components
    from mismo_spark.cluster.decremental import decremental_components
    from mismo_spark.cluster.pivot import pivot_clustering
    from mismo_spark.graph import edge_support, label_propagation

    spark = SparkSession.builder.appName("cluster_qa").getOrCreate()
    links = spark.read.parquet(args.links)

    canon = links.select(
        F.least("record_id_l", "record_id_r").alias("record_id_l"),
        F.greatest("record_id_l", "record_id_r").alias("record_id_r"),
        *([F.col(args.odds_column).alias("odds")] if args.odds_column else []),
    ).dropDuplicates(["record_id_l", "record_id_r"])
    canon.persist()

    assignment = connected_components(
        canon, checkpoint_dir=args.checkpoint_dir
    )

    support = edge_support(
        canon,
        src_column="record_id_l",
        dst_column="record_id_r",
        max_degree=args.max_degree,
    ).withColumnsRenamed({"node_a": "record_id_l", "node_b": "record_id_r"})

    if args.splitter == "lpa":
        comm = label_propagation(
            canon,
            n_iter=args.lpa_iter,
            src_column="record_id_l",
            dst_column="record_id_r",
            checkpoint_dir=args.checkpoint_dir,
        )
    else:
        recs = (
            canon.select(F.col("record_id_l").alias("record_id"))
            .unionByName(canon.select(F.col("record_id_r").alias("record_id")))
            .distinct()
        )
        comm = pivot_clustering(
            canon.withColumn("__sim", F.lit(1.0)),
            recs,
            sim_col="__sim",
            threshold=1.0,
            checkpoint_dir=args.checkpoint_dir,
        ).select(F.col("record_id").alias("node"), F.col("cluster").alias("label"))
    la = comm.select(
        F.col("node").alias("record_id_l"), F.col("label").alias("__ll")
    )
    lb = comm.select(
        F.col("node").alias("record_id_r"), F.col("label").alias("__lr")
    )

    # a support-0 link that IS its whole 2-node component cannot be a
    # weld — only flag bridges inside components of >= 3 records
    comp_size = assignment.groupBy("component").agg(
        F.count(F.lit(1)).alias("__csz")
    )
    in_big = (
        assignment.join(comp_size, "component")
        .filter(F.col("__csz") >= 3)
        .select(F.col("record_id").alias("record_id_l"))
    )
    bridges = (
        support.filter(F.col("support") == 0)
        .join(in_big, "record_id_l", "left_semi")
        .join(la, "record_id_l")
        .join(lb, "record_id_r")
        .withColumn("lpa_split", F.col("__ll") != F.col("__lr"))
        .drop("__ll", "__lr")
    )
    if args.odds_column:
        bridges = bridges.join(
            canon.select("record_id_l", "record_id_r", "odds"),
            ["record_id_l", "record_id_r"],
        ).filter(F.col("odds") < F.lit(args.max_bridge_odds))

    confirmed = bridges.filter(F.col("lpa_split"))
    bridges.write.mode("overwrite").parquet(f"{args.output}/bridges.parquet")

    if args.dry_run:
        repaired = assignment
    else:
        repaired = decremental_components(
            assignment,
            canon.select("record_id_l", "record_id_r"),
            confirmed.select("record_id_l", "record_id_r"),
            checkpoint_dir=args.checkpoint_dir,
        )
    repaired.write.mode("overwrite").parquet(
        f"{args.output}/assignment.parquet"
    )

    n_before = assignment.select("component").distinct().count()
    n_after = repaired.select("component").distinct().count()
    print(
        json.dumps(
            {
                "links": canon.count(),
                "bridges_flagged": bridges.count(),
                "bridges_removed": 0 if args.dry_run else confirmed.count(),
                "components_before": n_before,
                "components_after": n_after,
            }
        )
    )
    canon.unpersist()
    # no spark.stop(): spark-submit tears the JVM down at process exit,
    # and in-process tests share the session via getOrCreate


if __name__ == "__main__":
    main()
