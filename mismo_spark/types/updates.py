"""Updates: a table of struct<before, after> columns with accessors.

Semantics of mismo/types/_updates.py:104-375 — the full accessor
surface on top of the raw diff table produced by
``mismo_spark.types.diff.diff_tables``:

* ``Updates.from_tables(before, after, join_on=key)`` — inner-join the
  two snapshots on the key and wrap every shared column as
  struct<before, after> (mismo/types/_updates.py:192-231).
* ``before()`` / ``after()`` — project the snapshots back out
  (mismo/types/_updates.py:304-310).
* ``apply_to(t)`` — replay the updates onto a table: remove the
  before-rows, append the after-rows (mismo/types/_updates.py:322-375).
* ``filter(...)`` stays an Updates.

Plan shape: ``from_tables`` is one hash join on the key;
``apply_to`` is an exceptAll (left-anti-style set difference) plus a
union — both single-shuffle, no driver-side row handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mismo_spark.types.diff import is_changed, value_change  # noqa: F401 (re-export)

_NOT_SET = object()


class Updates:
    """Wraps a DataFrame whose columns are all struct<before, after>
    (mismo/types/_updates.py:104-116).  Columns present only before
    (removed) have a null-typed ``after`` field and vice versa."""

    def __init__(self, diff_table: DataFrame) -> None:
        for name in diff_table.columns:
            dt = diff_table.schema[name].dataType
            if not isinstance(dt, T.StructType) or not (
                {"before", "after"} & set(dt.fieldNames())
            ):
                raise ValueError(
                    f"Column {name!r} must be a struct with a 'before' or "
                    f"'after' field; got {dt.simpleString()}"
                )
        self.df = diff_table

    @classmethod
    def from_tables(
        cls, before: DataFrame, after: DataFrame, *, join_on: str
    ) -> "Updates":
        """Inner-join snapshots on ``join_on``; only rows present in both
        are updates (mismo/types/_updates.py:192-231).  Insertions and
        deletions are Diff's job (mismo_spark.types.diff.diff_tables)."""
        all_columns = list(dict.fromkeys([*after.columns, *before.columns]))
        b = before.alias("b")
        a = after.alias("a")
        joined = b.join(a, F.col(f"b.{join_on}") == F.col(f"a.{join_on}"), "inner")
        cols = []
        for c in all_columns:
            fields = []
            if c in before.columns:
                fields.append(F.col(f"b.{c}").alias("before"))
            if c in after.columns:
                fields.append(F.col(f"a.{c}").alias("after"))
            cols.append(F.struct(*fields).alias(c))
        return cls(joined.select(*cols))

    # -- column-level accessors (mismo/types/_updates.py:280-302) -------

    def before_values(self) -> dict[str, Column]:
        return {
            c: self.df[c]["before"]
            for c in self.df.columns
            if "before" in self._fields(c)
        }

    def after_values(self) -> dict[str, Column]:
        return {
            c: self.df[c]["after"]
            for c in self.df.columns
            if "after" in self._fields(c)
        }

    def _fields(self, c: str) -> set[str]:
        return set(self.df.schema[c].dataType.fieldNames())

    def schema_change(self, c: str) -> str:
        """'added' / 'removed' / 'unchanged' for a column
        (mismo/types/_updates.py:54-67)."""
        f = self._fields(c)
        if "before" not in f:
            return "added"
        if "after" not in f:
            return "removed"
        return "unchanged"

    # -- table-level accessors -------------------------------------------

    def before(self) -> DataFrame:
        """The (updated rows of the) table before the changes."""
        vals = self.before_values()
        return self.df.select(*[v.alias(c) for c, v in vals.items()])

    def after(self) -> DataFrame:
        """The (updated rows of the) table after the changes."""
        vals = self.after_values()
        return self.df.select(*[v.alias(c) for c, v in vals.items()])

    def filter(self, predicate: Column) -> "Updates":
        return Updates(self.df.filter(predicate))

    def cache(self) -> "Updates":
        return Updates(self.df.cache())

    def apply_to(self, t: DataFrame, *, defaults=_NOT_SET) -> DataFrame:
        """Replay: ``(t - before()) ∪ after()``
        (mismo/types/_updates.py:322-375).

        If ``after`` has columns ``before`` lacks, ``defaults`` must be
        given (a dict for mutate; None means null-fill), mirroring the
        reference's contract.  exceptAll + unionByName: two narrow
        passes, one shuffle each, no driver materialization.
        """
        before, after = self.before(), self.after()
        t_schema = sorted((f.name, f.dataType) for f in t.schema.fields)
        b_schema = sorted((f.name, f.dataType) for f in before.schema.fields)
        if t_schema != b_schema:
            raise ValueError(
                f"table schema {t_schema} != before schema {b_schema}"
            )
        t = t.exceptAll(before.select(*t.columns))
        missing = [c for c in after.columns if c not in before.columns]
        if missing:
            if defaults is _NOT_SET:
                raise ValueError(
                    "after has extra columns; provide defaults "
                    f"for {missing} (or defaults=None for nulls)"
                )
            if defaults is None:
                defaults = {
                    c: F.lit(None).cast(after.schema[c].dataType) for c in missing
                }
            already = [c for c in defaults if c in t.columns]
            if already:
                raise ValueError(f"default columns {already} already exist")
            t = t.withColumns(dict(defaults))
        return t.select(*after.columns).unionByName(after)
