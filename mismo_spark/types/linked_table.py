"""LinkedTable aggregates: per-record views of linked neighbours.

Semantics of mismo/types/_linked_table.py:17-323.  Each function takes
(records, links, side) where ``side`` is "l" (records are the left table,
neighbours are on the right) or "r".
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark.types.linkage import ID_L, ID_R


def _ids(side: str) -> tuple[str, str]:
    if side == "l":
        return ID_L, ID_R
    if side == "r":
        return ID_R, ID_L
    raise ValueError(f"side must be 'l' or 'r', got {side!r}")


def with_linked_values(
    records: DataFrame,
    other: DataFrame,
    links: DataFrame,
    side: str = "l",
    **aggs: str | Callable[[DataFrame], Column],
) -> DataFrame:
    """Attach aggregated values of linked rows to each record
    (mismo/types/_linked_table.py:53-190).

    ``aggs`` maps output column name → either a column name in ``other``
    (default aggregate: collect into array, the reference's ``.collect()``)
    or a callable(joined_df) -> aggregate Column.

    One shuffle: links ⨝ other on the far id (hash join), then
    groupBy(my_id) with map-side partial aggregation, then a join back to
    records — ``collect_list`` has no partial-combine but the groupBy
    keys are the record ids, so the shuffle is the unavoidable one.
    """
    my_id, other_id = _ids(side)
    joined = links.join(
        other.withColumnRenamed("record_id", other_id), other_id, "inner"
    )
    exprs = []
    for name, spec in aggs.items():
        if isinstance(spec, str):
            exprs.append(F.collect_list(spec).alias(name))
        else:
            exprs.append(spec(joined).alias(name))
    agged = joined.groupBy(F.col(my_id).alias("record_id")).agg(*exprs)
    return records.join(agged, "record_id", "left")


def with_n_links(
    records: DataFrame, links: DataFrame, side: str = "l", out: str = "n_links"
) -> DataFrame:
    """Per-record distinct link count, 0 for unlinked records
    (mismo/types/_linked_table.py:192-245)."""
    my_id, other_id = _ids(side)
    counts = (
        links.select(my_id, other_id)
        .distinct()
        .groupBy(F.col(my_id).alias("record_id"))
        .agg(F.count(F.lit(1)).alias(out))
    )
    return records.join(counts, "record_id", "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(0))
    )


def link_counts(records: DataFrame, links: DataFrame, side: str = "l") -> "LinkCountsTable":
    """Histogram: how many records have k links, including k=0
    (mismo/types/_linked_table.py:247-303).  Returns a
    :class:`LinkCountsTable` of (n_links, n_records)."""
    from mismo_spark.types.counts_table import LinkCountsTable

    withn = with_n_links(records, links, side)
    return LinkCountsTable(
        withn.groupBy(F.col("n_links"))
        .agg(F.count(F.lit(1)).alias("n_records"))
        .orderBy(F.desc("n_links"))
    )
