"""Term-frequency tooling: value→frequency lookups and rarity filters.

Semantics of mismo/tf/_tf.py:17-154 and mismo/tf/_filterer.py:112-117.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mismo_spark._util import bind_one


def value_stats(df: DataFrame, column) -> DataFrame:
    """(value, n, frequency) per distinct value
    (mismo/tf/_tf.py:17-92, ColumnStats)."""
    col = bind_one(df, column)
    n_total = df.count()
    return (
        df.select(col.alias("value"))
        .na.drop()
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("frequency", F.col("n") / F.lit(float(n_total)))
    )


def add_frequencies(
    df: DataFrame, column: str, *, out: str | None = None
) -> DataFrame:
    """Join each row's value frequency on, default 1/N for unseen/null
    (mismo/tf/_tf.py:60-92)."""
    out = out or f"{column}_frequency"
    n_total = df.count()
    stats = value_stats(df, column).select(
        F.col("value").alias(column), F.col("frequency").alias(out)
    )
    return df.join(stats, column, "left").withColumn(
        out, F.coalesce(F.col(out), F.lit(1.0 / max(n_total, 1)))
    )


def rare_value_filter(df: DataFrame, column, *, max_frequency: float) -> DataFrame:
    """Keep rows whose value frequency ≤ max_frequency — the TF guard
    against blocking on 'john smith' (mismo/tf/_tf.py:122-154 spirit)."""
    col_name = column if isinstance(column, str) else None
    tmp = df if col_name else df.withColumn("__v", bind_one(df, column))
    key = col_name or "__v"
    withf = add_frequencies(tmp, key, out="__freq")
    return withf.filter(F.col("__freq") <= max_frequency).drop(
        "__freq", *([] if col_name else ["__v"])
    )


def ambiguous_haystack_filter(haystack: DataFrame, keys: list[str]) -> DataFrame:
    """Drop haystack rows whose key appears more than once — identity
    lookups must be unambiguous (mismo/tf/_filterer.py:112-117)."""
    w = Window.partitionBy(*keys)
    return (
        haystack.withColumn("__n", F.count(F.lit(1)).over(w))
        .filter(F.col("__n") == 1)
        .drop("__n")
    )


class StatsTable:
    """(value, count, frequency) per distinct value of one column
    (mismo/tf/_tf.py:17-31).  ``df`` is the underlying DataFrame; the
    classmethod mirrors the reference's ``from_column``."""

    def __init__(self, df: DataFrame) -> None:
        missing = {"value", "count", "frequency"} - set(df.columns)
        if missing:
            raise ValueError(f"StatsTable missing columns {sorted(missing)}")
        self.df = df

    @classmethod
    def from_column(cls, df: DataFrame, column) -> "StatsTable":
        stats = value_stats(df, column)
        return cls(
            stats.select("value", F.col("n").alias("count"), "frequency")
        )


class ColumnStats:
    """Frequency statistics for one column, reusable across tables
    (mismo/tf/_tf.py:34-92).  The stats DataFrame is persisted on first
    use (the reference ``cache()``-es) so N ``add_frequencies`` calls
    pay one aggregation; broadcast into each probe join — the stats side
    is ≤ #distinct values of one column."""

    def __init__(self, df: DataFrame, column) -> None:
        self.column = column if isinstance(column, str) else None
        self.name = self.column or "value"
        self._source = df
        self._stats: StatsTable | None = None

    @property
    def stats_table(self) -> StatsTable:
        if self._stats is None:
            st = StatsTable.from_column(self._source, self.column or self.name)
            st.df = st.df.persist()
            self._stats = st
        return self._stats

    def add_frequencies(
        self,
        table: DataFrame,
        *,
        column: str | None = None,
        name_as: str | None = None,
        default: float | str = "1/N",
    ) -> DataFrame:
        """Left-join this model's frequencies onto ``table``; unseen and
        NULL values get ``default`` (``"1/N"`` = 1/count(table), the
        reference default — mismo/tf/_tf.py:50-92)."""
        column = column or self.name
        name_as = name_as or f"frequency_{self.name}"
        if default in ("1/N", "1/n"):
            fill = 1.0 / max(table.count(), 1)
        else:
            fill = float(default)  # type: ignore[arg-type]
        stats = self.stats_table.df.select(
            F.col("value").alias(column), F.col("frequency").alias(name_as)
        )
        return table.join(F.broadcast(stats), column, "left").withColumn(
            name_as, F.coalesce(F.col(name_as), F.lit(fill))
        )

    def unpersist(self) -> None:
        if self._stats is not None:
            self._stats.df.unpersist()
            self._stats = None


class TermFrequencyModel:
    """Frequency models for several columns of one source table
    (mismo/tf/_tf.py:95-154): ``add_term_frequencies`` joins a
    ``frequency_<col>`` column per modeled column."""

    def __init__(self, df: DataFrame, columns: list[str] | None = None) -> None:
        self.columns = list(columns or df.columns)
        self._df = df
        # build once: each ColumnStats lazily persists ONE stats
        # DataFrame per column; constructing fresh ones per access
        # would re-run the aggregation and leak cached relations
        # (r4 ADVICE fix — memoized, released via unpersist())
        self._column_stats = {c: ColumnStats(self._df, c) for c in self.columns}

    @property
    def column_stats(self) -> dict[str, ColumnStats]:
        # fresh dict: a caller mutating the returned mapping must not
        # corrupt the memoized state unpersist() walks (r5 ADVICE)
        return dict(self._column_stats)

    def add_term_frequencies(
        self, table: DataFrame, *, default: float | str = "1/N"
    ) -> DataFrame:
        for c, cs in self.column_stats.items():
            table = cs.add_frequencies(table, column=c, default=default)
        return table

    def unpersist(self) -> None:
        """Release every per-column cached stats DataFrame."""
        for cs in self._column_stats.values():
            cs.unpersist()


class RareLookupFilterer:
    """Filter a needle/haystack lookup to rare keys only
    (mismo/tf/_filterer.py:14-82): keys whose haystack frequency exceeds
    ``max_frequency`` are too common to identify a record."""

    def __init__(self, keys: list[str], *, max_frequency: float) -> None:
        self.keys = list(keys)
        self.max_frequency = max_frequency

    def __call__(self, haystack: DataFrame) -> DataFrame:
        key = F.concat_ws("\x1f", *[F.coalesce(F.col(k).cast("string"), F.lit("\x00")) for k in self.keys])
        return rare_value_filter(
            haystack.withColumn("__k", key), "__k", max_frequency=self.max_frequency
        ).drop("__k")


class AmbiguousHaystackFilterer:
    """Drop haystack rows whose key tuple is not unique
    (mismo/tf/_filterer.py:85-117)."""

    def __init__(self, keys: list[str]) -> None:
        self.keys = list(keys)

    def __call__(self, haystack: DataFrame) -> DataFrame:
        return ambiguous_haystack_filter(haystack, self.keys)
