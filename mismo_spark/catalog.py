"""Table IO with an Apache Iceberg gate and a parquet fallback.

The production target (BASELINE.json north rule) checkpoints every
pipeline stage to Iceberg tables — atomic snapshot commits, partition
pruning, schema evolution, and time-travel reads for resume/audit.
Iceberg support in Spark is a runtime extension
(``org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions``
+ a catalog config); this sandbox does not ship the jar, so everything
here gates on :func:`iceberg_available` and falls back to plain parquet
paths with the SAME call shape.  Nothing is stubbed: the parquet branch
is the fully-working engine used by the pipeline and tests; the Iceberg
branch is the one-line format swap it was written for.

Target naming convention:

* ``catalog.db.table`` (no slashes, has dots) → a table identifier —
  written with ``saveAsTable`` / ``writeTo`` (Iceberg when configured).
* anything else → a filesystem path → parquet.

At 100 TB the difference matters: Iceberg commits make a stage
checkpoint atomic (no half-written parquet directory on executor
loss), and the manifest-file pruning keeps resume reads from listing
10^6 files.  The pipeline's own JSON manifest (pipeline.py) carries the
per-partition lineage counters either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


ICEBERG_EXTENSION = (
    "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
)


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark extension is on this session's
    classpath AND an Iceberg catalog is configured."""
    try:
        ext = spark.conf.get("spark.sql.extensions", "") or ""
    except Exception:
        return False
    if ICEBERG_EXTENSION not in ext:
        return False
    # at least one catalog declared as an Iceberg SparkCatalog
    try:
        jconf = spark.sparkContext.getConf().getAll()
    except Exception:
        return False
    return any(
        k.startswith("spark.sql.catalog.") and "iceberg" in str(v).lower()
        for k, v in jconf
    )


_FILE_EXTENSIONS = (".parquet", ".orc", ".csv", ".json", ".avro", ".txt", ".tsv")


def is_table_identifier(target: str) -> bool:
    """``catalog.db.table`` style: dots, no path separators, and NOT a
    bare filename — ``links.parquet`` is a file target, not a table
    (r4 ADVICE fix: known data-file extensions route to the path
    writer even without a directory separator)."""
    if "/" in target or "\\" in target or "." not in target:
        return False
    return not target.lower().endswith(_FILE_EXTENSIONS)


def write_table(
    df: DataFrame,
    target: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Write ``df`` to ``target`` — an Iceberg table when the session
    has Iceberg and ``target`` is a table identifier, else a parquet
    path.  ``mode`` is 'overwrite' or 'append'."""
    spark = df.sparkSession
    if is_table_identifier(target) and iceberg_available(spark):
        writer = df.writeTo(target)
        if partition_by:
            from pyspark.sql import functions as F

            writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
        if mode == "append":
            writer.append()
        else:
            writer.createOrReplace()
        return
    if is_table_identifier(target):
        # no Iceberg runtime: the session catalog still takes tables
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.saveAsTable(target)
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(target)


def read_table(spark: SparkSession, target: str) -> DataFrame:
    """Read back what :func:`write_table` wrote."""
    if is_table_identifier(target):
        return spark.read.table(target)
    return spark.read.parquet(target)


def snapshot_id(spark: SparkSession, target: str) -> int | None:
    """Current Iceberg snapshot id of a table (for resume manifests),
    or None when the target is not an Iceberg table."""
    if not (is_table_identifier(target) and iceberg_available(spark)):
        return None
    row = (
        spark.sql(f"SELECT snapshot_id FROM {target}.snapshots "
                  "ORDER BY committed_at DESC LIMIT 1")
        .collect()
    )
    return int(row[0][0]) if row else None
