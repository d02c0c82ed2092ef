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
