"""Array utilities — higher-order column algebra throughout.

Semantics of mismo/arrays/_array.py:14-202 and
mismo/arrays/_builtins.py:29-71.  The reference's random
``array_shuffle``/``array_choice`` (mismo/arrays/_array.py:159-167) are
replaced with SEEDED hash-order variants — deterministic across runs and
cluster sizes, which the resume/byte-identity gates require.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def array_combinations(a: Column, b: Column) -> Column:
    """Cartesian product → array<struct<l, r>>
    (mismo/arrays/_array.py:14-34)."""
    return F.flatten(
        F.transform(a, lambda x: F.transform(b, lambda y: F.struct(x.alias("l"), y.alias("r"))))
    )


def array_combinations_first_n(a: Column, b: Column, n: int) -> Column:
    """Pairs of the first n × first n elements
    (mismo/arrays/_array.py:37-76)."""
    return array_combinations(F.slice(a, 1, n), F.slice(b, 1, n))


def array_min_(a: Column) -> Column:
    return F.array_min(a)


def array_max_(a: Column) -> Column:
    return F.array_max(a)


def array_sum(a: Column) -> Column:
    """mismo/arrays/_builtins.py:29-71; empty → 0, matching list_sum."""
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x)


def array_mean(a: Column) -> Column:
    n = F.size(a)
    return F.when(n > 0, array_sum(a) / n)


def array_median(a: Column) -> Column:
    """Median via array_sort + middle element(s)."""
    s = F.array_sort(a)
    n = F.size(a)
    mid = (n / 2).cast("int")
    odd = F.element_at(s, mid + 1).cast("double")
    even = (F.element_at(s, mid) + F.element_at(s, mid + 1)).cast("double") / 2
    return F.when(n == 0, F.lit(None).cast("double")).otherwise(
        F.when(n % 2 == 1, odd).otherwise(even)
    )


def array_any(a: Column) -> Column:
    """True if any element true (mismo/arrays/_builtins.py)."""
    return F.exists(a, lambda x: x)


def array_all(a: Column) -> Column:
    return F.forall(a, lambda x: x)


def array_shuffle_seeded(a: Column, seed: int = 42) -> Column:
    """Deterministic 'shuffle': order by per-element hash.  Replaces the
    reference's random array_shuffle (mismo/arrays/_array.py:159-162)."""
    keyed = F.transform(
        a, lambda x: F.struct(F.xxhash64(x, F.lit(seed)).alias("k"), x.alias("v"))
    )
    return F.transform(F.array_sort(keyed), lambda s: s["v"])


def array_choice_seeded(a: Column, n: int, seed: int = 42) -> Column:
    """Deterministic 'sample n': first n of the hash-shuffled array
    (mismo/arrays/_array.py:165-167, made reproducible)."""
    return F.slice(array_shuffle_seeded(a, seed), 1, n)


def array_sort_by(a: Column, key) -> Column:
    """Sort array by a computed key (mismo/arrays/_array.py:170-202).
    ``key``: Column-fn element → orderable."""
    keyed = F.transform(a, lambda x: F.struct(key(x).alias("k"), x.alias("v")))
    return F.transform(F.array_sort(keyed), lambda s: s["v"])


def array_filter_isin_other(
    df: DataFrame,
    array_column,
    other: DataFrame,
    other_column: str,
    *,
    result_name: str = "filtered",
) -> DataFrame:
    """Keep only array elements present in another table's column,
    order-preserving (mismo/arrays/_array.py:79-135).

    When ``other`` is small it is broadcast and the filter stays
    JVM-side (array_contains against a collected literal would bake data
    into the plan; instead we join the exploded form and re-collect by
    original position — the reference's unnest→semi→re-collect, one
    shuffle)."""
    from mismo_spark._util import unique_name

    arr = df[array_column] if isinstance(array_column, str) else array_column
    rid = unique_name("rid")
    pos = unique_name("pos")
    el = unique_name("el")
    base = df.withColumn(rid, F.monotonically_increasing_id())
    exploded = base.select(rid, F.posexplode_outer(arr).alias(pos, el))
    keep = exploded.join(
        F.broadcast(other.select(F.col(other_column).alias(el)).distinct()),
        el,
        "left_semi",
    )
    from pyspark.sql import Window

    recollected = (
        keep.withColumn(
            result_name,
            F.collect_list(el).over(
                Window.partitionBy(rid).orderBy(pos)
                .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ),
        )
        .groupBy(rid)
        .agg(F.first(result_name).alias(result_name))
    )
    # default for rows whose array had no survivors: empty array of the
    # INPUT element type (reference supports arbitrary element types,
    # mismo/arrays/_array.py:79-135 — a hardcoded array<string> would
    # fail the coalesce on e.g. array<long> inputs)
    arr_type = df.select(arr.alias("__t")).schema[0].dataType
    return (
        base.join(recollected, rid, "left")
        .withColumn(
            result_name,
            F.coalesce(F.col(result_name), F.array().cast(arr_type)),
        )
        .drop(rid)
    )
