"""Golden-record survivorship: collapse each cluster to one canonical
row with per-field merge rules.

The step after clustering that the reference leaves to the user: given
(record_id, component) and the record table, emit one row per component
whose fields are merged under explicit, DETERMINISTIC rules — every
rule has a total-order tie-break, so the golden record is a pure
function of the cluster contents (replayable across engines; the
oracle row relies on this).

Rules (per output column):
  "min" / "max"   extreme value (nulls ignored, SQL agg semantics)
  "first"         value from the row with the smallest record id —
                  the cluster representative's value
  "longest"       longest string value; ties -> lexicographically
                  largest (so the (length, value) struct is a total
                  order); nulls ignored
  "mode"          most frequent non-null value; ties -> smallest value

Plan shape: one groupBy(component) covers min/max/first/longest
(map-side partial agg); each "mode" column adds one
(component, value)-count groupBy + a min_by over the counts — still
pure aggregations, still skew-safe (a mega-cluster is one group, never
a gathered array).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RULES = ("min", "max", "first", "longest", "mode")


def golden_record(
    records: DataFrame,
    assignments: DataFrame,
    rules: dict[str, str],
    *,
    id_col: str = "record_id",
) -> DataFrame:
    """→ one row per component: (component, n_records, <rule columns>).

    ``rules`` maps column name → rule (see module docstring).
    ``assignments`` is any (record_id, component) table (e.g.
    ``connected_components`` output).
    """
    bad = {c: r for c, r in rules.items() if r not in _RULES}
    if bad:
        raise ValueError(f"unknown rules {bad}; valid: {_RULES}")
    missing = [c for c in rules if c not in records.columns]
    if missing:
        raise ValueError(f"rule columns not in records: {missing}")

    t = records.withColumnRenamed(id_col, "record_id").join(
        assignments, "record_id"
    )

    aggs: list[Column] = [F.count(F.lit(1)).alias("n_records")]
    mode_cols: list[str] = []
    for c, rule in rules.items():
        col = F.col(c)
        if rule == "min":
            aggs.append(F.min(col).alias(c))
        elif rule == "max":
            aggs.append(F.max(col).alias(c))
        elif rule == "first":
            aggs.append(F.min_by(col, F.col("record_id")).alias(c))
        elif rule == "longest":
            # null values get key (-1, null) — below every real string,
            # so a non-null wins whenever one exists
            aggs.append(
                F.max_by(
                    col,
                    F.struct(
                        F.coalesce(F.length(col), F.lit(-1)).alias("l"),
                        col.alias("v"),
                    ),
                ).alias(c)
            )
        else:
            mode_cols.append(c)

    out = t.groupBy("component").agg(*aggs)
    for c in mode_cols:
        counts = (
            t.where(F.col(c).isNotNull())
            .groupBy("component", c)
            .agg(F.count(F.lit(1)).alias("__cnt"))
        )
        mode = counts.groupBy("component").agg(
            F.min_by(
                F.col(c), F.struct((-F.col("__cnt")).alias("n"), F.col(c).alias("v"))
            ).alias(c)
        )
        out = out.join(mode, "component", "left")
    return out.select(
        "component", "n_records", *[c for c in rules]
    )
