"""SparkSession factory with scale-ready defaults.

Single place where we set the configs that matter at 100 TB:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing)
* Arrow on (pandas UDF batches are the only Python in the hot path)
* shuffle partitions sized by the caller (tests: 32; cluster: ~2-3x cores)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "mismo_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (sandbox) — on a
    real cluster you'd omit it and let spark-submit supply the master.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("MISMO_SPARK_SHUFFLE_PARTITIONS", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # AQE: runtime coalescing of small shuffle partitions and
        # skew-join splitting — the generic half of our skew story
        # (the semantic half is KeyLinker's max_pairs cap).
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for pandas UDFs (Jaro-Winkler etc.) — batch size tuned so
        # a batch of string pairs stays well under executor memory.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Quiet + deterministic for tests.
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # local mode: the driver heap IS the executor heap shared by all
        # worker threads — size it like an executor, not like a driver
        .config("spark.driver.memory", os.environ.get("MISMO_SPARK_DRIVER_MEM", "48g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
