"""Sorted-neighborhood blocking (Hernández & Stolfo 1995) — classic ER
blocking the reference doesn't ship: sort all records by a key, link
every record to its ``window − 1`` successors in sort order.
Complements KeyLinker (equality blocks) with a method that catches
near-boundary matches (typos in the first key character, adjacent
numeric keys) without any key agreeing exactly.

Scale design: Spark has no scalable global ``row_number`` (a
partition-less window collapses to ONE task), so the rank is built the
distributed way — ``repartitionByRange`` on the sort key (the same
range-exchange a global sort pays, terabyte-proven), per-partition
local ``row_number``, plus a driver-side cumulative offset of the K
per-partition counts (K rows to the driver, never data).  Pairing is
then ONE equi-join on integer rank with the left side exploded to its
``window−1`` rank offsets — shuffle is O(|records|·(window−1)) slim
(id, rank) rows.

Determinism: ties in the key are broken by ``record_id``, so ranks —
and therefore the pair set — are reproducible across runs, partition
counts, and engines (the DuckDB oracle replays the same
``row_number() OVER (ORDER BY key, record_id)``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mismo_spark._util import bind_one
from mismo_spark.linker.base import infer_task
from mismo_spark.types.linkage import ID_L, ID_R, Linkage


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    *,
    rank_col: str = "__rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Order-preserving 1-based global rank without a single-task
    window: range-repartition on the order columns, rank locally, add
    per-partition offsets (computed from a K-row count collect)."""
    parts = [F.col(c) for c in order_cols]
    if num_partitions is not None:
        d = df.repartitionByRange(num_partitions, *parts)
    else:
        d = df.repartitionByRange(*parts)
    d = d.withColumn("__pid", F.spark_partition_id())
    counts = {
        r["__pid"]: r["n"]
        for r in d.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    w = Window.partitionBy("__pid").orderBy(*parts)
    local = F.row_number().over(w)
    if len(offsets) <= 256:
        # few partitions: fold the offsets in as a literal CASE chain
        off = F.coalesce(
            *[
                F.when(F.col("__pid") == pid, F.lit(o))
                for pid, o in sorted(offsets.items())
            ],
            F.lit(0),
        ) if offsets else F.lit(0)
        return d.withColumn(rank_col, local + off).drop("__pid")
    # many partitions: a K-branch literal expression would blow the
    # janino expression-tree budget — broadcast-join the K-row offset
    # table instead (same K rows that were already on the driver)
    spark = df.sparkSession
    off_df = F.broadcast(
        spark.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()],
            "__pid int, __off long",
        )
    )
    return (
        d.withColumn(rank_col, local)
        .join(off_df, "__pid")
        .withColumn(rank_col, F.col(rank_col) + F.col("__off"))
        .drop("__pid", "__off")
    )


class SortedNeighborhoodLinker:
    """Link records within ``window`` positions of each other in
    key-sorted order.  ``window=3`` links each record to its 2
    successors.  Null keys never match (dropped before the sort), like
    KeyLinker's SQL-equality semantics.

    For ``task='link'`` both tables are interleaved into ONE sorted
    sequence (the classic multi-source variant) and only cross-table
    pairs within the window are emitted.
    """

    def __init__(
        self,
        key,
        *,
        window: int = 3,
        task: str | None = None,
        name: str | None = None,
    ) -> None:
        if window < 2:
            raise ValueError("window must be >= 2 (w-1 successors per record)")
        self.key = key
        self.window = window
        self.task = task
        self.name = name

    def _keyed(self, df: DataFrame) -> DataFrame:
        k = bind_one(df, self.key)
        return df.select(F.col("record_id"), k.alias("__snkey")).na.drop(
            subset=["__snkey"]
        )

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        if right is None:
            right = left
        task = infer_task(left, right, self.task)
        w = self.window

        if task == "dedupe":
            ranked = global_rank(
                self._keyed(left), ["__snkey", "record_id"]
            ).select("record_id", "__rank")
            probe = (
                ranked.select(F.col("record_id").alias(ID_L), "__rank")
                .withColumn(
                    "__i", F.explode(F.array(*[F.lit(i) for i in range(1, w)]))
                )
                .select(ID_L, (F.col("__rank") + F.col("__i")).alias("__rank"))
            )
            pairs = probe.join(
                ranked.select(F.col("record_id").alias(ID_R), "__rank"),
                "__rank",
            ).select(
                F.least(F.col(ID_L), F.col(ID_R)).alias(ID_L),
                F.greatest(F.col(ID_L), F.col(ID_R)).alias(ID_R),
            )
            return Linkage(left=left, right=right, links=pairs)

        # link: interleave both sides into one sorted sequence; a tag
        # column breaks rank ties AFTER record_id so the merged order is
        # deterministic even when ids collide across tables
        lt = self._keyed(left).withColumn("__side", F.lit(0))
        rt = self._keyed(right).withColumn("__side", F.lit(1))
        ranked = global_rank(
            lt.unionByName(rt), ["__snkey", "record_id", "__side"]
        ).select("record_id", "__side", "__rank")
        probe = (
            ranked.select(
                F.col("record_id").alias("__id_a"),
                F.col("__side").alias("__side_a"),
                "__rank",
            )
            .withColumn(
                "__i", F.explode(F.array(*[F.lit(i) for i in range(1, w)]))
            )
            .select(
                "__id_a",
                "__side_a",
                (F.col("__rank") + F.col("__i")).alias("__rank"),
            )
        )
        pairs = (
            probe.join(
                ranked.select(
                    F.col("record_id").alias("__id_b"),
                    F.col("__side").alias("__side_b"),
                    "__rank",
                ),
                "__rank",
            )
            .filter(F.col("__side_a") != F.col("__side_b"))
            .select(
                F.when(F.col("__side_a") == 0, F.col("__id_a"))
                .otherwise(F.col("__id_b"))
                .alias(ID_L),
                F.when(F.col("__side_a") == 0, F.col("__id_b"))
                .otherwise(F.col("__id_a"))
                .alias(ID_R),
            )
            .dropDuplicates([ID_L, ID_R])
        )
        return Linkage(left=left, right=right, links=pairs)
