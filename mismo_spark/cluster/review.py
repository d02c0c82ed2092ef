"""Cluster QA: cohesion stats and missed-merge detection over scored
links — the review queue between scoring and shipping an assignment.

Transitive closure is greedy: one spurious high-scoring link welds two
real entities together, and a threshold set for precision leaves
should-be-merges stranded in separate components.  Both failure modes
are visible from (scored links × assignment):

* ``cluster_cohesion`` — per component: size, intra-link count and
  odds distribution, weak-link count, and the link density against
  the n·(n−1)/2 complete graph.  Low min-odds or low density flags a
  chain held together by one dubious bridge.
* ``missed_merges`` — links scoring above a confidence bar whose
  endpoints landed in DIFFERENT components (e.g. the link was produced
  by a blocker that wasn't in the clustering graph, or fell just under
  the clustering threshold).  The human-review queue for recall.

Plan shape: two broadcast-able equi-joins of the narrow (record_id,
component) assignment onto the links, then one groupBy per component /
pair of components — shuffles keyed by component, never pair-vs-pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark.types.linkage import ID_L, ID_R


def _with_components(
    links: DataFrame, assignments: DataFrame
) -> DataFrame:
    a = assignments.select(
        F.col("record_id").alias(ID_L), F.col("component").alias("__cl")
    )
    b = assignments.select(
        F.col("record_id").alias(ID_R), F.col("component").alias("__cr")
    )
    return links.join(a, ID_L).join(b, ID_R)


def cluster_cohesion(
    assignments: DataFrame,
    scored_links: DataFrame,
    *,
    odds_col: str = "odds",
    weak_odds: float = 1.0,
) -> DataFrame:
    """→ one row per component with ≥ 2 records: (component, n_records,
    n_links, n_weak_links, min_odds, avg_odds, density).

    ``n_links`` counts scored links with BOTH endpoints inside the
    component; ``n_weak_links`` those with odds < ``weak_odds``;
    ``density`` = n_links / (n·(n−1)/2).  A big component with density
    near 0 and min_odds near the threshold is one bad bridge away from
    being two entities — review it before survivorship runs.
    """
    sizes = assignments.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_records")
    ).where(F.col("n_records") >= 2)
    intra = (
        _with_components(scored_links, assignments)
        .where(F.col("__cl") == F.col("__cr"))
        .groupBy(F.col("__cl").alias("component"))
        .agg(
            F.count(F.lit(1)).alias("n_links"),
            F.sum(
                F.when(F.col(odds_col) < weak_odds, 1).otherwise(0)
            ).alias("n_weak_links"),
            F.min(odds_col).alias("min_odds"),
            F.avg(odds_col).alias("avg_odds"),
        )
    )
    return (
        sizes.join(intra, "component", "left")
        .select(
            "component",
            F.col("n_records").cast("long").alias("n_records"),
            F.coalesce("n_links", F.lit(0)).cast("long").alias("n_links"),
            F.coalesce("n_weak_links", F.lit(0))
            .cast("long")
            .alias("n_weak_links"),
            "min_odds",
            "avg_odds",
            (
                F.coalesce("n_links", F.lit(0))
                / (F.col("n_records") * (F.col("n_records") - 1) / 2)
            ).alias("density"),
        )
    )


def missed_merges(
    assignments: DataFrame,
    scored_links: DataFrame,
    *,
    odds_col: str = "odds",
    min_odds: float = 100.0,
) -> DataFrame:
    """→ (id_l, id_r, odds, component_l, component_r): links scoring
    ≥ ``min_odds`` whose endpoints sit in different components — the
    recall review queue (candidate merges the clustering graph never
    saw or the threshold excluded)."""
    return (
        _with_components(
            scored_links.where(F.col(odds_col) >= min_odds), assignments
        )
        .where(F.col("__cl") != F.col("__cr"))
        .select(
            ID_L,
            ID_R,
            F.col(odds_col).alias("odds"),
            F.col("__cl").alias("component_l"),
            F.col("__cr").alias("component_r"),
        )
    )
