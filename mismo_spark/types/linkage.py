"""Linkage: left records + right records + links between them.

Semantics of mismo/linkage/_linkage.py:17-132 and
mismo/types/_links_table.py:15-223, re-expressed as three DataFrames.
``links`` always has ``record_id_l``/``record_id_r`` plus arbitrary
feature columns; no duplicate (l, r) pairs.

The parquet round-trip (``to_parquets``/``from_parquets``) is the
checkpoint mechanism: every pipeline stage persists a Linkage, and a
resumed run reloads it — mirroring mismo's ``Linkage.to_parquets``
(mismo/linkage/_linkage.py:103-132) but doubling as lineage-cutting at
scale (Iceberg-shaped; plain parquet in the sandbox).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mismo_spark._util import rename_all

ID_L = "record_id_l"
ID_R = "record_id_r"


@dataclass(frozen=True)
class Linkage:
    left: DataFrame
    right: DataFrame
    links: DataFrame

    def __post_init__(self) -> None:
        for c in (ID_L, ID_R):
            if c not in self.links.columns:
                raise ValueError(f"links must have column {c!r}; has {self.links.columns}")
        if "record_id" not in self.left.columns or "record_id" not in self.right.columns:
            raise ValueError("left/right must have a 'record_id' column")

    # -- LinksTable semantics (mismo/types/_links_table.py:97-190) ------

    def links_with_left(self, *, broadcast_records: bool = False) -> DataFrame:
        """Join left-record attributes onto links with `_l` suffixes."""
        lrec = rename_all(self.left, "_l")
        if broadcast_records:
            lrec = F.broadcast(lrec)
        return self.links.join(lrec, ID_L, "inner")

    def links_with_right(self, *, broadcast_records: bool = False) -> DataFrame:
        rrec = rename_all(self.right, "_r")
        if broadcast_records:
            rrec = F.broadcast(rrec)
        return self.links.join(rrec, ID_R, "inner")

    def links_with_both(self, *, broadcast_records: bool = False) -> DataFrame:
        """Pairs table with all record attributes, `_l`/`_r` suffixed.

        Join strategy matters more here than anywhere else in the
        engine: with sort-merge joins, the SECOND join re-shuffles the
        (pairs × left-attributes) intermediate — every candidate pair
        dragging its ~KBs of feature arrays through the exchange (at
        3.8M pairs that is ~10 GB of shuffle; it is what capped
        measured core-scaling of the compare stage at ~1.5×, the stage
        being I/O- not CPU-bound).  ``broadcast_records=True`` hashes
        the (narrow) record-feature table to every executor instead:
        the pair table then streams straight out of the blocker with
        ZERO pair shuffles.

        Policy at 100 TB: broadcast while the narrow per-record feature
        table fits in executor memory (millions of records); beyond
        that, bucket/co-partition records and links by record_id so the
        heavy side shuffles once, not per join (and leave AQE on).
        """
        return self.links_with_left(broadcast_records=broadcast_records).join(
            F.broadcast(rename_all(self.right, "_r"))
            if broadcast_records
            else rename_all(self.right, "_r"),
            ID_R,
            "inner",
        )

    def swap_perspective(self) -> "Linkage":
        """Swap l/r (mismo/types/_links_table.py:208-217)."""
        swapped = self.links
        renames = {}
        for c in swapped.columns:
            if c.endswith("_l"):
                renames[c] = c[:-2] + "_r"
            elif c.endswith("_r"):
                renames[c] = c[:-2] + "_l"
        swapped = swapped.select(*[F.col(c).alias(renames.get(c, c)) for c in swapped.columns])
        return Linkage(left=self.right, right=self.left, links=swapped)

    # -- filters (mismo/linkage/_linkage.py:206-301) ---------------------

    def filter_links(self, predicate: Column) -> "Linkage":
        return Linkage(self.left, self.right, self.links.filter(predicate))

    def best_match_per_right(self, score_col: str) -> "Linkage":
        """Keep only each right record's max-score link
        (window-predicate example, mismo/linkage/_linkage.py:248-270)."""
        w = Window.partitionBy(ID_R)
        links = (
            self.links.withColumn("__mx", F.max(score_col).over(w))
            .filter(F.col(score_col) == F.col("__mx"))
            .drop("__mx")
        )
        return Linkage(self.left, self.right, links)

    def min_rules_agree(self, n: int, *, rules_col: str = "blocking_rules") -> "Linkage":
        """Keep links found by ≥ n blocking rules (OrLinker provenance;
        the multi-rule-agreement filter example of
        mismo/linkage/_linkage.py:284-294)."""
        return self.filter_links(F.size(F.col(rules_col)) >= n)

    def unambiguous_only(self) -> "Linkage":
        """Keep links whose right record has exactly one link."""
        w = Window.partitionBy(ID_R)
        links = (
            self.links.withColumn("__n", F.count(F.lit(1)).over(w))
            .filter(F.col("__n") == 1)
            .drop("__n")
        )
        return Linkage(self.left, self.right, links)

    # -- persistence / checkpointing -------------------------------------

    def to_parquets(self, directory: str, overwrite: bool = False) -> None:
        """Persist all three tables (mismo/linkage/_linkage.py:103-118)."""
        mode = "overwrite" if overwrite else "errorifexists"
        self.left.write.mode(mode).parquet(os.path.join(directory, "left.parquet"))
        self.right.write.mode(mode).parquet(os.path.join(directory, "right.parquet"))
        self.links.write.mode(mode).parquet(os.path.join(directory, "links.parquet"))

    @staticmethod
    def from_parquets(spark: SparkSession, directory: str) -> "Linkage":
        """Resume from a checkpoint (mismo/linkage/_linkage.py:120-132)."""
        return Linkage(
            left=spark.read.parquet(os.path.join(directory, "left.parquet")),
            right=spark.read.parquet(os.path.join(directory, "right.parquet")),
            links=spark.read.parquet(os.path.join(directory, "links.parquet")),
        )

    # -- bucketed persistence (the 100 TB co-partition path) --------------

    def to_bucketed_tables(
        self,
        name: str,
        *,
        n_buckets: int = 64,
        path: str | None = None,
        overwrite: bool = False,
    ) -> None:
        """Persist as bucketed tables co-partitioned on the join keys.

        This is the scale regime ``links_with_both`` documents for when
        the record-feature table outgrows broadcast: ``left``/``right``
        are bucketed (and per-bucket sorted) on ``record_id``, ``links``
        on ``record_id_l``, all with the same bucket count.  A scan of a
        bucketed table reports ``HashPartitioning(key, n_buckets)``, and
        the ``_l``-suffix rename is alias-aware, so the subsequent
        ``links_with_left`` sort-merge join needs ZERO exchanges — and
        ``links_with_both`` exactly one (the pairs intermediate
        re-keyed on ``record_id_r``; the bucketed right side still scans
        shuffle-free).  The shuffle is paid once at write time and
        amortized over every run that reads the linkage — incremental
        dedupe re-joins the same corpus every batch (``streaming/
        incremental.py``), so at 100 TB this converts a per-run
        ~O(corpus) exchange into a one-time layout cost.

        ``path`` makes the tables external (parquet at ``path/<table>``);
        without it they land in the session warehouse.  In production
        point the catalog at a real metastore (or use Iceberg's bucket
        partition transform); the sandbox uses Spark's in-memory catalog.
        """
        spark = self.links.sparkSession
        mode = "overwrite" if overwrite else "errorifexists"
        parts = {"left": self.left, "right": self.right, "links": self.links}
        keys = {"left": "record_id", "right": "record_id", "links": ID_L}
        for part, df in parts.items():
            table = f"{name}_{part}"
            if overwrite:
                spark.sql(f"DROP TABLE IF EXISTS {table}")
            writer = (
                df.write.mode(mode)
                .format("parquet")
                .bucketBy(n_buckets, keys[part])
                .sortBy(keys[part])
            )
            if path is not None:
                writer = writer.option("path", os.path.join(path, table))
            writer.saveAsTable(table)

    @staticmethod
    def from_bucketed_tables(spark: SparkSession, name: str) -> "Linkage":
        """Reload a ``to_bucketed_tables`` linkage; joins through
        ``links_with_left``/``links_with_both`` then plan without
        re-shuffling the bucketed sides."""
        return Linkage(
            left=spark.table(f"{name}_left"),
            right=spark.table(f"{name}_right"),
            links=spark.table(f"{name}_links"),
        )
