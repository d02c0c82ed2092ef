"""Pivot correlation clustering (KwikCluster) — the middle ground
between connected components and community detection.

Ailon, Charikar & Newman, "Aggregating inconsistent information:
ranking and clustering" (JACM 2008): repeatedly pick a *pivot* from
the remaining records, form a cluster of the pivot plus every
remaining record POSITIVELY linked to it, remove them, repeat.  With a
uniformly random pivot order this is the celebrated 3-approximation
for correlation clustering — minimizing disagreements (positive edges
cut + negative/absent edges kept inside clusters).

ER reading: ``connected_components`` treats links as transitive and
welds chains ("A~B, B~C ⇒ A,C together even if A-C looks nothing
alike"); KwikCluster only groups records DIRECTLY linked to the
pivot, so an absent A-C edge counts as evidence against the weld.  It
sits between CC (pure transitivity) and ``graph.label_propagation``
(density voting) in the cluster-repair toolbox, and never produces a
cluster of diameter > 2 in the link graph.

Determinism: we fix the pivot order to ascending ``record_id`` (the
same derandomization the reference ecosystem uses for reproducible
runs; the approximation guarantee formally needs a random order — use
a keyed hash of the id as the id if adversarial inputs matter).  Under
id order the pivot set is exactly the lexicographically-first MIS of
the link graph — the same local-minima rounds as
:func:`mismo_spark.linker.canopy.canopy_centers` — and every
non-pivot record joins its SMALLEST adjacent pivot, which is the
first pivot the sequential scan would have removed it with.  The
whole algorithm is therefore the canopy center loop plus one
min-aggregate join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark.linker.canopy import _sym, canopy_centers


def pivot_clustering(
    edges: DataFrame,
    records: DataFrame,
    *,
    sim_col: str,
    threshold: float,
    max_rounds: int = 40,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """→ DataFrame(record_id, cluster): KwikCluster with id-order
    pivots over the positive graph ``{sim >= threshold}``.

    ``cluster`` is the pivot's record_id; every record appears exactly
    once (pivots in their own cluster, isolated records as singleton
    pivots).  Plan: the MIS rounds of ``canopy_centers`` (see there
    for the per-round shape), then one semi-join + groupBy-min keyed
    on record id for the membership."""
    # sim edges feed both the pivot rounds and the membership join —
    # persist across the two, released after the eager checkpoint
    ed = edges.persist()
    try:
        pivots = canopy_centers(
            ed,
            records,
            sim_col=sim_col,
            tight=threshold,
            max_rounds=max_rounds,
            checkpoint_dir=checkpoint_dir,
        )
        pe = _sym(ed, sim_col, threshold)
        # non-pivot records: smallest adjacent pivot = the pivot whose
        # sequential turn would have removed them first
        member = (
            pe.join(pivots.withColumnRenamed("record_id", "u"), "u", "left_semi")
            .groupBy(F.col("v").alias("record_id"))
            .agg(F.min("u").alias("cluster"))
            .join(pivots, "record_id", "left_anti")  # pivots keep their own id
        )
        own = pivots.select("record_id", F.col("record_id").alias("cluster"))
        return member.unionByName(own).localCheckpoint(eager=True)
    finally:
        # symmetric release even on failure — long-lived sessions (the
        # oracle harness, notebook users) must not accumulate caches
        ed.unpersist()
