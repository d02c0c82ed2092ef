"""Column profiling — the pre-flight data-quality report a pipeline
runs before blocking (null rates drive key choices; skewed
distributions predict hot blocks).  Beyond the reference (mismo's eda
module is plotting-only and out of scope).

One aggregation job for ALL columns (one pass over the data, one
1-row result reshaped to long form with ``stack``) — never a job per
column.  Quantiles use Spark's exact ``percentile`` (linear
interpolation), which matches DuckDB's ``quantile_cont`` to float
precision, so the whole profile is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_numeric(df: DataFrame, columns: list[str]) -> DataFrame:
    """→ (column, n, n_null, n_distinct, min, max, mean, p50, p95),
    one row per profiled numeric column, computed in ONE aggregation.
    """
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        aggs += [
            F.count(col).alias(f"__n_{c}"),
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.count_distinct(col).alias(f"__nd_{c}"),
            F.min(col).alias(f"__min_{c}"),
            F.max(col).alias(f"__max_{c}"),
            F.avg(col).alias(f"__avg_{c}"),
            F.percentile(col, F.lit(0.5)).alias(f"__p50_{c}"),
            F.percentile(col, F.lit(0.95)).alias(f"__p95_{c}"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __n_{c}, __nn_{c}, __nd_{c}, __min_{c}, __max_{c}, "
        f"__avg_{c}, __p50_{c}, __p95_{c}"
        for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS "
            "(column, n, n_null, n_distinct, min, max, mean, p50, p95)"
        )
    )


def histogram(
    df: DataFrame,
    column: str,
    *,
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Equi-width histogram → (bin, lo, hi, n), bins indexed 0..bins−1,
    upper edge inclusive in the last bin.  Bounds default to the
    column's min/max (one extra tiny aggregation); the binning pass is
    one map + one groupBy with map-side partial aggregation — the
    standard distributed histogram.  NULLs are dropped."""
    col = F.col(column).cast("double")
    if lo is None or hi is None:
        row = df.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if hi <= lo:
        hi = lo + 1.0
    width = (hi - lo) / bins
    b = F.least(
        F.greatest(F.floor((col - F.lit(lo)) / F.lit(width)), F.lit(0)),
        F.lit(bins - 1),
    ).cast("int")
    return (
        df.filter(col.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bin",
            (F.lit(lo) + F.col("bin") * F.lit(width)).alias("lo"),
            (F.lit(lo) + (F.col("bin") + 1) * F.lit(width)).alias("hi"),
            "n",
        )
    )
