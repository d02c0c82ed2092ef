"""Time-window blocking: link records whose timestamps are within
``window`` seconds (optionally also agreeing on equality keys) — the
temporal analogue of CoordinateLinker's lat/lon grid, but with EXACT
recall.  The reference has no temporal blocker (its closest tool is a
plain JoinLinker with an inequality predicate, which DuckDB executes
as an IEJoin but Spark would execute as a cross product); web-scale ER
needs one constantly: the same page recrawled within a day, the same
user's burst of events, near-simultaneous observations of one entity.

Scale design — never an inequality join: each record's timestamp is
bucketed to ``floor(unix_micros / window_us)``; two records within the
window are at most one bucket apart, so candidate pairs come from an
EQUI-join on (keys…, bucket) with one side exploded to its adjacent
bucket offsets (2 rows/record for dedupe, 3 for link), then the exact
``|Δt| ≤ window`` filter.  The shuffle is keyed by (keys…, bucket) —
co-partitioned, AQE-coalescible, and all arithmetic is integer
microseconds (``unix_micros`` / DuckDB ``epoch_us``) so the oracle
replay is engine-exact, no float epoch rounding.

Exactly-once pair generation (no distinct shuffle): for dedupe the
probe side explodes to bucket offsets {0, +1} and the join keeps only
pairs with (t, id) lexicographically increasing — a same-bucket pair
appears in both orientations and the filter keeps one; an
adjacent-bucket pair is only ever generated from the earlier record's
+1 branch.  A hot (key, bucket) cell degenerates quadratically exactly
like a hot KeyLinker key — for dense streams include a selective key
(user, host) or shrink the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind_one
from mismo_spark.linker.base import infer_task
from mismo_spark.types.linkage import ID_L, ID_R, Linkage


class TimeWindowLinker:
    """Block pairs with ``|ts_l − ts_r| ≤ window`` seconds, ANDed with
    equality on each of ``keys`` (null keys or timestamps never match,
    per SQL-equality blocking semantics)."""

    def __init__(
        self,
        timestamp,
        *,
        window: float,
        keys=(),
        task: str | None = None,
        name: str | None = None,
    ) -> None:
        if window <= 0:
            raise ValueError("window must be > 0 seconds")
        self.timestamp = timestamp
        self.window_us = int(round(window * 1_000_000))
        # generic band width used by the join machinery; BandLinker
        # (linker/band.py) reuses __call__ with a raw numeric band
        self._band = self.window_us
        self.keys = list(keys)
        self.task = task
        self.name = name

    def _keyed(self, df: DataFrame) -> DataFrame:
        # parquet timestamps arrive as TIMESTAMP_NTZ, which unix_micros
        # rejects; the cast is a no-op for TIMESTAMP and a uniform
        # session-tz shift for NTZ — harmless, since buckets shift
        # uniformly and the final filter uses only differences
        ts = bind_one(df, self.timestamp).cast("timestamp")
        cols = [F.col("record_id"), F.unix_micros(ts).alias("__t")]
        cols += [
            bind_one(df, k).alias(f"__k{i}") for i, k in enumerate(self.keys)
        ]
        out = df.select(*cols).na.drop(
            subset=["__t"] + [f"__k{i}" for i in range(len(self.keys))]
        )
        return out.withColumn(
            "__b", F.floor(F.col("__t") / F.lit(self._band))
        )

    def __call__(
        self, left: DataFrame, right: DataFrame | None = None
    ) -> Linkage:
        if right is None:
            right = left
        task = infer_task(left, right, self.task)
        kcols = [f"__k{i}" for i in range(len(self.keys))]

        if task == "dedupe":
            base = self._keyed(left)
            probe = base.select(
                F.col("record_id").alias(ID_L),
                F.col("__t").alias("__tl"),
                *kcols,
                F.explode(F.array(F.lit(0), F.lit(1))).alias("__i"),
                (F.col("__b") + F.col("__i")).alias("__jb"),
            ).drop("__i")
            build = base.select(
                F.col("record_id").alias(ID_R),
                F.col("__t").alias("__tr"),
                *[F.col(c).alias(f"{c}_r") for c in kcols],
                F.col("__b").alias("__jb"),
            )
            cond = [probe["__jb"] == build["__jb"]] + [
                probe[c] == build[f"{c}_r"] for c in kcols
            ]
            pairs = (
                probe.join(build, self._and(cond))
                .filter(
                    F.abs(F.col("__tl") - F.col("__tr"))
                    <= F.lit(self._band)
                )
                .filter(
                    (F.col("__tl") < F.col("__tr"))
                    | (
                        (F.col("__tl") == F.col("__tr"))
                        & (F.col(ID_L) < F.col(ID_R))
                    )
                )
                .select(
                    F.least(ID_L, ID_R).alias(ID_L),
                    F.greatest(ID_L, ID_R).alias(ID_R),
                )
            )
            return Linkage(left=left, right=right, links=pairs)

        lb = self._keyed(left)
        rb = self._keyed(right)
        probe = lb.select(
            F.col("record_id").alias(ID_L),
            F.col("__t").alias("__tl"),
            *kcols,
            F.explode(
                F.array(F.lit(-1), F.lit(0), F.lit(1))
            ).alias("__i"),
            (F.col("__b") + F.col("__i")).alias("__jb"),
        ).drop("__i")
        build = rb.select(
            F.col("record_id").alias(ID_R),
            F.col("__t").alias("__tr"),
            *[F.col(c).alias(f"{c}_r") for c in kcols],
            F.col("__b").alias("__jb"),
        )
        cond = [probe["__jb"] == build["__jb"]] + [
            probe[c] == build[f"{c}_r"] for c in kcols
        ]
        pairs = (
            probe.join(build, self._and(cond))
            .filter(
                F.abs(F.col("__tl") - F.col("__tr")) <= F.lit(self._band)
            )
            .select(ID_L, ID_R)
        )
        return Linkage(left=left, right=right, links=pairs)

    @staticmethod
    def _and(conds):
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out
