"""Cluster crosswalk + event classification between two assignment
snapshots — the ops telemetry for incremental/decremental maintenance.

After every maintenance batch (``incremental.py`` / ``decremental.py``)
the operator of a 10^12-record linkage wants to know WHAT moved: which
clusters merged, which split, how many records changed label — before
downstream consumers (golden records, dedup verdicts) re-materialize.
This module answers that from the two (record_id, component) tables
alone.

Plan shape: the crosswalk is one groupBy over the record-level
full-outer join (one shuffle sized by the records); every event
classification after that aggregates the CROSSWALK — a table bounded
by #components + #changes, not #records.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cluster_crosswalk(old: DataFrame, new: DataFrame) -> DataFrame:
    """→ DataFrame(old_component, new_component, n_records): how many
    records moved from each old cluster to each new one.

    ``old_component`` is NULL for records that appear only in ``new``
    (fresh records); ``new_component`` is NULL for records that appear
    only in ``old`` (deleted records).
    """
    o = old.select(
        "record_id", F.col("component").alias("old_component")
    )
    n = new.select(
        "record_id", F.col("component").alias("new_component")
    )
    return (
        o.join(n, "record_id", "full_outer")
        .groupBy("old_component", "new_component")
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


def cluster_events(old: DataFrame, new: DataFrame) -> DataFrame:
    """→ one row per NEW component: (new_component, n_records,
    n_old_components, n_new_records, is_merge, is_split, event).

    * ``n_old_components`` — distinct old clusters contributing records
    * ``n_new_records``    — records with no old assignment at all
    * ``is_merge``         — ≥ 2 old clusters contributed
    * ``is_split``         — some contributing old cluster also sent
                             records to a DIFFERENT new cluster (or to
                             deletion), i.e. it did not arrive whole
    * ``event``            — 'new' | 'stable' | 'grew' | 'merge' |
                             'split' | 'merge+split'
                             ('grew' = one old cluster arrived whole
                             plus fresh records; 'stable' = one old
                             cluster, arrived whole, nothing else)

    Deleted records (new_component NULL) are excluded from the output
    rows but DO count as splits of their old cluster.
    """
    xw = cluster_crosswalk(old, new)

    # does each old cluster land wholly in one new cluster?
    old_fanout = (
        xw.where(F.col("old_component").isNotNull())
        .groupBy("old_component")
        .agg(
            F.count_distinct(
                F.coalesce(F.col("new_component"), F.lit(-1))
            ).alias("__n_dests")
        )
    )
    contrib = (
        xw.where(F.col("new_component").isNotNull())
        .join(old_fanout, "old_component", "left")
    )
    per_new = contrib.groupBy("new_component").agg(
        F.sum("n_records").alias("n_records"),
        F.count_distinct(
            F.when(
                F.col("old_component").isNotNull(), F.col("old_component")
            )
        ).alias("n_old_components"),
        F.sum(
            F.when(F.col("old_component").isNull(), F.col("n_records")).otherwise(
                F.lit(0)
            )
        ).alias("n_new_records"),
        F.max(
            F.when(F.col("__n_dests") > 1, F.lit(True)).otherwise(F.lit(False))
        ).alias("is_split"),
    )
    is_merge = F.col("n_old_components") >= 2
    is_split = F.col("is_split")
    event = (
        F.when(F.col("n_old_components") == 0, F.lit("new"))
        .when(is_merge & is_split, F.lit("merge+split"))
        .when(is_merge, F.lit("merge"))
        .when(is_split, F.lit("split"))
        .when(F.col("n_new_records") > 0, F.lit("grew"))
        .otherwise(F.lit("stable"))
    )
    return per_new.select(
        "new_component",
        F.col("n_records").cast("long").alias("n_records"),
        F.col("n_old_components").cast("long").alias("n_old_components"),
        F.col("n_new_records").cast("long").alias("n_new_records"),
        is_merge.alias("is_merge"),
        is_split.alias("is_split"),
        event.alias("event"),
    )
