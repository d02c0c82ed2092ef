"""Shared linker plumbing: task inference and pair assembly.

Semantics of mismo/linker/_common.py:21-28 (dedupe iff left is right) and
the `_l`/`_r` pair construction of mismo/joins/_core.py:29-145.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark.types.linkage import ID_L, ID_R, Linkage


def infer_task(left: DataFrame, right: DataFrame, task: str | None) -> str:
    """'dedupe' iff left and right are the same table
    (mismo/linker/_common.py:21-28).  Spark has no ``Table.equals``;
    we compare the identity of the analyzed plan object, falling back
    to 'link' — callers doing dedupe on a re-read table should pass
    task='dedupe' explicitly.
    """
    if task is not None:
        return task
    if left is right:
        return "dedupe"
    try:
        if left._jdf.queryExecution().analyzed().sameResult(
            right._jdf.queryExecution().analyzed()
        ):
            return "dedupe"
    except Exception:
        pass
    return "link"


def ids_only(df: DataFrame, alias: str) -> DataFrame:
    return df.select(F.col("record_id").alias(alias))


def remove_condition_overlap(conditions) -> list[Column]:
    """Constrain each join condition so it cannot produce a pair an
    earlier condition already produced: ``cond_i AND NOT cond_0 AND …
    AND NOT cond_{i-1}`` (mismo/joins/_core.py:148-162).

    At the plan level this turns an OR-of-rules union into DISJOINT
    branches, trading re-evaluation of earlier predicates per branch
    for removal of the distinct/groupBy shuffle an
    ``OrLinker(track_rules=False)`` otherwise pays — the right trade
    when the predicates are cheap column ops and the pair table is
    huge.  ``True``/``False`` literals are accepted like the
    reference's ``ibis.literal`` path."""
    out: list[Column] = []
    priors: list[Column] = []
    for cond in conditions:
        if isinstance(cond, bool):
            cond = F.lit(cond)
        modified = cond
        for prior in priors:
            modified = modified & ~prior
        priors.append(cond)
        out.append(modified)
    return out


def make_linkage(
    left: DataFrame,
    right: DataFrame,
    condition_builder,
    task: str | None,
    extra_link_cols: list[Column] | None = None,
    how: str = "inner",
) -> Linkage:
    """Build a Linkage from a join-condition builder.

    ``condition_builder(l, r)`` receives the two aliased DataFrames and
    returns a Column condition.  Links carry only the two ids (plus any
    extras) — attributes are re-joined on demand by
    ``Linkage.links_with_both`` (projection pushdown keeps the blocking
    join narrow: only key columns + record_id are scanned).
    """
    task = infer_task(left, right, task)
    l = left.alias("__mismo_l")
    r = right.alias("__mismo_r")
    # The builder gets alias-qualified resolvers, NOT the DataFrames:
    # df.alias(x)["col"] binds to the ORIGINAL attribute id, which is
    # ambiguous when left and right share a plan (self-join dedupe).
    # F.col("alias.col") resolves through the SubqueryAlias instead.
    cond = condition_builder(_Side(l, "__mismo_l"), _Side(r, "__mismo_r"))
    if task == "dedupe":
        # halve the self-join: record_id_l < record_id_r
        # (mismo/linker/_key_linker.py:192)
        cond = cond & (F.col("__mismo_l.record_id") < F.col("__mismo_r.record_id"))
    links = l.join(r, cond, how).select(
        F.col("__mismo_l.record_id").alias(ID_L),
        F.col("__mismo_r.record_id").alias(ID_R),
        *(extra_link_cols or []),
    )
    return Linkage(left=left, right=right, links=links)


class _Side:
    """One side of a blocking join: ``side["col"]`` / ``side.col`` give
    alias-qualified columns that stay unambiguous in self-joins; other
    DataFrame attributes (``columns``, ``schema``, …) pass through."""

    def __init__(self, df: DataFrame, alias: str) -> None:
        self._df = df
        self._alias = alias

    def __getitem__(self, name: str) -> Column:
        return F.col(f"{self._alias}.{name}")

    def __getattr__(self, name: str):
        if name in self._df.columns:
            return F.col(f"{self._alias}.{name}")
        return getattr(self._df, name)
