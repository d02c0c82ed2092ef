"""Schema-declared loaders for the classic record-linkage playdata sets.

Semantics of mismo/playdata.py:23-317 (FEBRL 1-3, RLdata500/10000,
PATSTAT patents): read a CSV with the exact published schema, cache it,
and return a Linkage whose links are the ground-truth pairs derived
from ``label_true`` (left.label_true == right.label_true AND
left.record_id < right.record_id, mismo/playdata.py:53-61).

Unlike the reference we do NOT bundle the data files (no external data
in this repo); every loader takes an explicit ``path``.  The schemas,
dtype choices (postcode/street_number kept as strings for leading
zeros, mismo/playdata.py:34-45) and the label->links construction are
identical.

Plan shape: the ground-truth self-join is an equi-join on label_true —
a single hash shuffle on the label, never a cross join; at any scale
the pair count is bounded by the true-cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T
from pyspark.sql import functions as F

from mismo_spark.types.linkage import ID_L, ID_R, Linkage

__all__ = [
    "load_febrl",
    "load_patents",
    "load_rldata",
    "linkage_from_labels",
]

# mismo/playdata.py:34-45 — street_number/postcode stay strings for
# leading zeros; date_of_birth stays string ("contains some BS dates").
FEBRL_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.IntegerType()),
        T.StructField("label_true", T.IntegerType()),
        T.StructField("given_name", T.StringType()),
        T.StructField("surname", T.StringType()),
        T.StructField("street_number", T.StringType()),
        T.StructField("address_1", T.StringType()),
        T.StructField("address_2", T.StringType()),
        T.StructField("suburb", T.StringType()),
        T.StructField("postcode", T.StringType()),
        T.StructField("state", T.StringType()),
        T.StructField("soc_sec_id", T.IntegerType()),
        T.StructField("date_of_birth", T.StringType()),
    ]
)

# mismo/playdata.py:246-256
RLDATA_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.LongType()),
        T.StructField("label_true", T.LongType()),
        T.StructField("fname_c1", T.StringType()),
        T.StructField("fname_c2", T.StringType()),
        T.StructField("lname_c1", T.StringType()),
        T.StructField("lname_c2", T.StringType()),
        T.StructField("by", T.LongType()),
        T.StructField("bm", T.LongType()),
        T.StructField("bd", T.LongType()),
    ]
)

# mismo/playdata.py:148-158
PATENTS_SCHEMA = T.StructType(
    [
        T.StructField("record_id", T.LongType()),
        T.StructField("label_true", T.LongType()),
        T.StructField("name_true", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("coauthors", T.StringType()),
        T.StructField("classes", T.StringType()),
    ]
)


def linkage_from_labels(records: DataFrame) -> Linkage:
    """Ground-truth Linkage from a labeled dedupe table
    (mismo/playdata.py:53-61).

    Links are all intra-cluster pairs: equi-join on label_true with
    record_id_l < record_id_r.  Null labels produce no links.
    """
    lx = records.select(
        F.col("record_id").alias(ID_L), F.col("label_true").alias("__lbl")
    )
    rx = records.select(
        F.col("record_id").alias(ID_R), F.col("label_true").alias("__lbl")
    )
    links = (
        lx.join(rx, "__lbl", "inner")
        .filter(F.col(ID_L) < F.col(ID_R))
        .select(ID_L, ID_R)
    )
    return Linkage(left=records, right=records, links=links)


def _load_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    # header CSVs; empty string -> null matches the reference's pandas/
    # DuckDB CSV readers (NULLs in fname_c2/lname_c2 etc.)
    return spark.read.csv(path, header=True, schema=schema, nullValue="")


def load_febrl(spark: SparkSession, path: str) -> Linkage:
    """Load a FEBRL dataset CSV (datasets 1-3 share one schema,
    mismo/playdata.py:23-90)."""
    return linkage_from_labels(_load_csv(spark, path, FEBRL_SCHEMA))


def load_rldata(spark: SparkSession, path: str) -> Linkage:
    """Load RLdata500 / RLdata10000 (mismo/playdata.py:246-317)."""
    return linkage_from_labels(_load_csv(spark, path, RLDATA_SCHEMA))


def load_patents(spark: SparkSession, path: str) -> Linkage:
    """Load the PATSTAT patents dataset (mismo/playdata.py:95-167)."""
    return linkage_from_labels(_load_csv(spark, path, PATENTS_SCHEMA))
