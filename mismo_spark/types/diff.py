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
    # rows present in both sides with no shared-column change
    # (mismo/types/_diff.py:60-68); None for Diffs built before this
    # field existed (older to_parquets layouts)
    unchanged: DataFrame | None = None

    def to_parquets(self, directory: str, overwrite: bool = False) -> None:
        """mismo/types/_diff.py:177-190."""
        mode = "overwrite" if overwrite else "errorifexists"
        self.insertions.write.mode(mode).parquet(os.path.join(directory, "insertions.parquet"))
        self.deletions.write.mode(mode).parquet(os.path.join(directory, "deletions.parquet"))
        self.updates.write.mode(mode).parquet(os.path.join(directory, "updates.parquet"))
        if self.unchanged is not None:
            self.unchanged.write.mode(mode).parquet(
                os.path.join(directory, "unchanged.parquet")
            )

    @staticmethod
    def from_parquets(spark: SparkSession, directory: str) -> "Diff":
        """mismo/types/_diff.py:192-205."""
        unchanged_path = os.path.join(directory, "unchanged.parquet")
        return Diff(
            insertions=spark.read.parquet(os.path.join(directory, "insertions.parquet")),
            deletions=spark.read.parquet(os.path.join(directory, "deletions.parquet")),
            updates=spark.read.parquet(os.path.join(directory, "updates.parquet")),
            unchanged=(
                spark.read.parquet(unchanged_path)
                if os.path.exists(unchanged_path)
                else None
            ),
        )

    def stats(self) -> "DiffStats":
        return DiffStats(self)


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
    unchanged = both.select("a.*")
    if any_changed is not None:
        # keep only rows where something actually changed
        # (mismo/types/_diff.py:70-72)
        flags = both.select(*cols, any_changed.alias("__chg"))
        updates = flags.filter(F.col("__chg")).drop("__chg")
        unchanged = both.filter(~any_changed).select("a.*")
    return Diff(
        insertions=insertions,
        deletions=deletions,
        updates=updates,
        unchanged=unchanged,
    )


class DiffStats:
    """Row-count summary of a Diff (mismo/types/_diff.py:294-340):
    insertions / deletions / updates / unchanged, with before/after
    totals derived (before = deletions + updates + unchanged, after =
    insertions + updates + unchanged — the 1-1 key contract).  Counts
    are computed lazily and memoized; each is an aggregate over one of
    the diff's projections of the single full-outer join, so persist
    the joined diff first if you need all of them over a huge table."""

    def __init__(self, diff: Diff) -> None:
        self._diff = diff
        self._cache: dict[str, int] = {}

    def _count(self, name: str, df: DataFrame | None) -> int:
        if name not in self._cache:
            if df is None:
                raise ValueError(
                    "this Diff has no 'unchanged' table (loaded from an "
                    "older to_parquets layout); rebuild it with diff_tables"
                )
            self._cache[name] = df.count()
        return self._cache[name]

    def n_insertions(self) -> int:
        return self._count("insertions", self._diff.insertions)

    def n_deletions(self) -> int:
        return self._count("deletions", self._diff.deletions)

    def n_updates(self) -> int:
        return self._count("updates", self._diff.updates)

    def n_unchanged(self) -> int:
        return self._count("unchanged", self._diff.unchanged)

    def n_before(self) -> int:
        return self.n_deletions() + self.n_updates() + self.n_unchanged()

    def n_after(self) -> int:
        return self.n_insertions() + self.n_updates() + self.n_unchanged()

    def __repr__(self) -> str:
        return (
            f"DiffStats(before={self.n_before():_}, after={self.n_after():_},"
            f" unchanged={self.n_unchanged():_}, updates={self.n_updates():_},"
            f" insertions={self.n_insertions():_},"
            f" deletions={self.n_deletions():_})"
        )


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
