"""Diff / Updates: 1-1 before/after table reconciliation.

Semantics of mismo/types/_diff.py:19-205 and
mismo/types/_updates.py:15-150, for batch-incremental tooling:

* ``diff_tables(before, after, key)`` → insertions / deletions /
  updates, where updates carry ``struct<before, after>`` per shared
  column and only rows where something actually changed are kept.
* ``value_change(struct_col)`` ∈ {remained_null, became_null,
  became_nonnull, changed, unchanged}.

Plan shape: one full-outer join on the key (single shuffle), then the
three outputs are filters/projections of it.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Diff:
    insertions: DataFrame
    deletions: DataFrame
    updates: DataFrame  # key + struct<before,after> per shared column

    def to_parquets(self, directory: str, overwrite: bool = False) -> None:
        """mismo/types/_diff.py:177-190."""
        mode = "overwrite" if overwrite else "errorifexists"
        self.insertions.write.mode(mode).parquet(os.path.join(directory, "insertions.parquet"))
        self.deletions.write.mode(mode).parquet(os.path.join(directory, "deletions.parquet"))
        self.updates.write.mode(mode).parquet(os.path.join(directory, "updates.parquet"))

    @staticmethod
    def from_parquets(spark: SparkSession, directory: str) -> "Diff":
        """mismo/types/_diff.py:192-205."""
        return Diff(
            insertions=spark.read.parquet(os.path.join(directory, "insertions.parquet")),
            deletions=spark.read.parquet(os.path.join(directory, "deletions.parquet")),
            updates=spark.read.parquet(os.path.join(directory, "updates.parquet")),
        )


def diff_tables(before: DataFrame, after: DataFrame, key: str) -> Diff:
    """1-1 diff keyed on ``key`` (mismo/types/_diff.py:106-165).

    insertions: keys only in after; deletions: keys only in before;
    updates: keys in both where any shared column changed (null-safe).
    """
    shared = [c for c in before.columns if c in set(after.columns) and c != key]
    b = before.alias("b")
    a = after.alias("a")
    joined = b.join(a, F.col(f"b.{key}") == F.col(f"a.{key}"), "full_outer")

    insertions = joined.filter(F.col(f"b.{key}").isNull()).select("a.*")
    deletions = joined.filter(F.col(f"a.{key}").isNull()).select("b.*")

    both = joined.filter(F.col(f"b.{key}").isNotNull() & F.col(f"a.{key}").isNotNull())
    any_changed = None
    cols = [F.col(f"b.{key}").alias(key)]
    for c in shared:
        changed = ~F.col(f"b.{c}").eqNullSafe(F.col(f"a.{c}"))
        any_changed = changed if any_changed is None else (any_changed | changed)
        cols.append(
            F.struct(
                F.col(f"b.{c}").alias("before"), F.col(f"a.{c}").alias("after")
            ).alias(c)
        )
    updates = both.select(*cols)
    if any_changed is not None:
        # keep only rows where something actually changed
        # (mismo/types/_diff.py:70-72)
        flags = both.select(*cols, any_changed.alias("__chg"))
        updates = flags.filter(F.col("__chg")).drop("__chg")
    return Diff(insertions=insertions, deletions=deletions, updates=updates)


def value_change(updated: Column) -> Column:
    """struct<before,after> → change category
    (mismo/types/_updates.py:69-150)."""
    b, a = updated["before"], updated["after"]
    return (
        F.when(b.isNull() & a.isNull(), F.lit("remained_null"))
        .when(b.isNotNull() & a.isNull(), F.lit("became_null"))
        .when(b.isNull() & a.isNotNull(), F.lit("became_nonnull"))
        .when(b == a, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )


def is_changed(updated: Column) -> Column:
    """null-safe before != after (mismo/types/_updates.py:46-52)."""
    return ~updated["before"].eqNullSafe(updated["after"])
