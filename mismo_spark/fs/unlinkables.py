"""Unlinkables analysis: how much of the corpus can never link, at any
threshold.

Beyond the reference (splink's `unlinkables_chart` is the well-known
incarnation; mismo has no equivalent).  For every input record take the
BEST score among all candidate pairs it participates in; the cumulative
distribution of those per-record maxima tells you, for any chosen
threshold t, what fraction of records would remain unlinked — the
operating-point question every linkage deployment asks first.

Plan shape: the scored-pairs table collapses to one (record, best)
row via union-of-two-projections + max groupBy (map-side combinable,
shuffle on record id), the records table left-joins in the
never-compared rows, and the cumulative sum runs over the collapsed
histogram (≤ #distinct scores rows), never over pairs — the same
collapse-before-window discipline as fs/curve.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def best_scores(
    records: DataFrame,
    scored_links: DataFrame,
    *,
    score: str = "odds",
    id_column: str = "record_id",
) -> DataFrame:
    """→ (record_id, best): each record's maximum pair score; NULL for
    records that never appeared in a candidate pair."""
    # explode, not a two-orientation union: a union references the
    # scored-links plan twice and Spark re-executes it — behind this
    # sits the whole scoring pipeline
    halves = scored_links.select(
        F.col(score).alias("__s"),
        F.explode(
            F.array(F.col(f"{id_column}_l"), F.col(f"{id_column}_r"))
        ).alias(id_column),
    )
    best = halves.groupBy(id_column).agg(F.max("__s").alias("best"))
    return records.select(id_column).join(best, id_column, "left")


def unlinkables(
    records: DataFrame,
    scored_links: DataFrame,
    *,
    score: str = "odds",
    id_column: str = "record_id",
    round_digits: int | None = 6,
) -> DataFrame:
    """Cumulative distribution of per-record best scores.

    → (best, n_records, cum_records, cum_prop) ordered by ``best``
    ascending with NULL (never-compared records) first: ``cum_prop`` at
    row b = fraction of ALL records whose best score is ≤ b — i.e. the
    fraction left unlinked by a threshold just above b."""
    per_record = best_scores(
        records, scored_links, score=score, id_column=id_column
    )
    if round_digits is not None:
        per_record = per_record.withColumn(
            "best", F.round(F.col("best"), round_digits)
        )
    hist = per_record.groupBy("best").agg(
        F.count(F.lit(1)).alias("n_records")
    )
    w = (
        Window.orderBy(F.col("best").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    total = records.count()
    return (
        hist.withColumn("cum_records", F.sum("n_records").over(w))
        .withColumn(
            "cum_prop", F.col("cum_records") / F.lit(float(max(total, 1)))
        )
        .orderBy(F.col("best").asc_nulls_first())
    )
