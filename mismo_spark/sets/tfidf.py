"""TF-IDF over array-of-terms columns.

Semantics of mismo/sets/_tfidf.py:11-315: document frequency, idf,
per-row term→count maps, per-row sparse tf-idf maps (optionally
L2-normalized), and rare-term extraction.

Plan shape: one explode + groupBy(term) for the corpus statistics
(shuffle on term, partial-aggregated), then a broadcast-or-shuffle join
of the (small) idf table back onto exploded rows, re-collected with
``map_from_entries(collect_list(...))`` grouped by record id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind_one, unique_name


def document_counts(df: DataFrame, terms_column) -> DataFrame:
    """DF(term): number of records containing each distinct term
    (mismo/sets/_tfidf.py:11-73).  → (term, n_records)."""
    terms = bind_one(df, terms_column)
    return (
        df.select(F.explode(F.array_distinct(terms)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


def term_idf(df: DataFrame, terms_column) -> DataFrame:
    """idf = ln(N / df) (mismo/sets/_tfidf.py:76-117). → (term, idf)."""
    n = df.count()
    return document_counts(df, terms_column).select(
        "term", F.log(F.lit(float(n)) / F.col("n_records")).alias("idf")
    )


def add_array_value_counts(
    df: DataFrame, terms_column, *, out: str = "term_counts"
) -> DataFrame:
    """Per-row term→count map (mismo/sets/_tfidf.py:122-190).

    No shuffle: value_counts of an array is computed with higher-order
    functions (aggregate over distinct terms)."""
    terms = bind_one(df, terms_column)
    counts = F.map_from_entries(
        F.transform(
            F.array_distinct(terms),
            lambda t: F.struct(
                t.alias("key"),
                F.size(F.filter(terms, lambda x: x == t)).alias("value"),
            ),
        )
    )
    return df.withColumn(out, counts)


def add_tfidf(
    df: DataFrame,
    terms_column,
    *,
    out: str = "tfidf",
    normalize: bool = True,
    id_column: str = "record_id",
) -> DataFrame:
    """Per-row sparse tf-idf map, L2-normalized by default
    (mismo/sets/_tfidf.py:193-274)."""
    idf = term_idf(df, terms_column)
    counted = add_array_value_counts(df, terms_column, out="__tc")
    exploded = counted.select(
        id_column, F.explode("__tc").alias("term", "tf")
    )
    joined = exploded.join(idf, "term", "inner").select(
        id_column, "term", (F.col("tf") * F.col("idf")).alias("w")
    )
    if normalize:
        from pyspark.sql import Window

        norm = F.sqrt(F.sum(F.col("w") * F.col("w")).over(Window.partitionBy(id_column)))
        joined = joined.withColumn(
            "w", F.when(norm > 0, F.col("w") / norm).otherwise(F.col("w"))
        )
    vecs = joined.groupBy(id_column).agg(
        F.map_from_entries(F.collect_list(F.struct("term", "w"))).alias(out)
    )
    return df.join(vecs, id_column, "left")


def rare_terms(
    df: DataFrame,
    terms_column,
    *,
    max_records_n: int | None = None,
    max_records_frac: float | None = None,
) -> DataFrame:
    """Terms appearing in ≤ n (or ≤ frac·N) records
    (mismo/sets/_tfidf.py:277-315)."""
    if (max_records_n is None) == (max_records_frac is None):
        raise ValueError("exactly one of max_records_n / max_records_frac")
    dc = document_counts(df, terms_column)
    if max_records_frac is not None:
        max_records_n = int(max_records_frac * df.count())
    return dc.filter(F.col("n_records") <= max_records_n).select("term")
