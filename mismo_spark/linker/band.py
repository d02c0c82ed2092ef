"""Numeric band blocking: link records whose NUMERIC attribute values
are within ``band`` of each other (optionally ANDed with equality
keys) — the generic form of :class:`TimeWindowLinker`'s bucket trick
for prices, lengths, coordinates-along-one-axis, embedding norms…

Same scale design, never an inequality join: values bucket to
``floor(x / band)``; two in-band values are at most one bucket apart,
so candidates come from an EQUI-join on (keys…, bucket) with the
probe side exploded to adjacent offsets, then the exact
``|Δ| ≤ band`` filter — shuffle keyed by (keys…, bucket), and the
same (value, id) lexicographic gate gives exactly-once dedupe pairs
with no distinct.  All machinery is inherited from TimeWindowLinker
(linker/time.py); only the value derivation differs (raw double
instead of integer microseconds).

Float caveat: bucketing and the band filter are plain IEEE double
ops — deterministic and engine-identical, but if your attribute is
decimal-valued (money), scale to integers first for exact band
boundaries, as TimeWindowLinker does with microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind_one
from mismo_spark.linker.time import TimeWindowLinker


class BandLinker(TimeWindowLinker):
    """Block pairs with ``|x_l − x_r| ≤ band`` on ``column``, ANDed
    with equality on each of ``keys`` (nulls never match)."""

    def __init__(
        self,
        column,
        *,
        band: float,
        keys=(),
        task: str | None = None,
        name: str | None = None,
    ) -> None:
        if band <= 0:
            raise ValueError("band must be > 0")
        self.column = column
        self._band = band
        self.keys = list(keys)
        self.task = task
        self.name = name

    def _keyed(self, df: DataFrame) -> DataFrame:
        v = bind_one(df, self.column).cast("double")
        cols = [F.col("record_id"), v.alias("__t")]
        cols += [
            bind_one(df, k).alias(f"__k{i}") for i, k in enumerate(self.keys)
        ]
        out = df.select(*cols).na.drop(
            subset=["__t"] + [f"__k{i}" for i in range(len(self.keys))]
        )
        return out.withColumn(
            "__b", F.floor(F.col("__t") / F.lit(self._band))
        )
