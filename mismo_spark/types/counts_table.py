"""CountsTable — a DataFrame with an integer ``n`` column plus count
conveniences (mismo/_counts_table.py:22-58).

The reference wraps its counts tables (KeyLinker.key_counts /
pair_counts) in a ``TableWrapper`` exposing ``n_total()`` and an altair
chart.  Here CountsTable IS a DataFrame (subclass of the classic
implementation sharing the same JVM plan — zero copy), so every
DataFrame operation keeps working and ``n_total()`` is one memoized
one-row aggregate.  Charts/dashboards stay out of scope (agreed round
1, eda family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.classic.dataframe import DataFrame as _ClassicDataFrame


class CountsTable(_ClassicDataFrame):
    """A counts DataFrame: identifier columns + an integer ``n``."""

    def __new__(cls, df: DataFrame) -> "CountsTable":
        # the abstract pyspark DataFrame.__new__ hardcodes the classic
        # class (it is a classic/connect dispatcher, not a constructor)
        # — bypass it so the subclass identity survives
        return object.__new__(cls)

    def __init__(self, df: DataFrame) -> None:
        super().__init__(df._jdf, df.sparkSession)
        self._n_total: int | None = None

    def n_total(self) -> int:
        """``sum(n)`` with nulls as 0, memoized
        (mismo/_counts_table.py:38-43)."""
        if self._n_total is None:
            row = self.agg(F.sum("n").alias("__t")).collect()[0]
            self._n_total = int(row["__t"] or 0)
        return self._n_total


class KeyCountsTable(CountsTable):
    """Counts of records per blocking key (mismo/_counts_table.py:48-51)."""


class PairCountsTable(CountsTable):
    """Counts of pairs per blocking key (mismo/_counts_table.py:54-57)."""


class LinkCountsTable(_ClassicDataFrame):
    """Records binned by link count — exactly (n_records, n_links)
    columns, validated like the reference
    (mismo/types/_linked_table.py:326-349; its only other member is an
    altair chart — eda, out of scope)."""

    def __new__(cls, df: DataFrame) -> "LinkCountsTable":
        return object.__new__(cls)

    def __init__(self, df: DataFrame) -> None:
        if set(df.columns) != {"n_records", "n_links"}:
            raise ValueError(
                "LinkCountsTable must have exactly columns"
                " 'n_records' and 'n_links'"
            )
        super().__init__(df._jdf, df.sparkSession)
