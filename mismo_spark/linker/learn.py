"""Blocking-scheme learning: pick the cheapest set of blocking rules
that covers the labeled matches — the data-driven answer to "which
KeyLinkers should my OrLinker contain?".

The reference leaves rule choice to the user (its `KeyLinker` docs
demonstrate hand-picked keys); splink ships the same idea as blocking
rule *recommendation*.  Here it is distributed and deterministic:

* ``blocking_rule_stats`` — for each candidate rule: how many labeled
  match pairs it covers (recall) and how many candidate pairs it would
  generate corpus-wide (cost, the KeyLinker ``pair_counts`` sum).  The
  recall/cost table is the evidence a human needs to pick rules.
* ``greedy_blocking_rules`` — classic greedy set cover over the
  labeled pairs: each step picks the rule with the most NOT-YET-covered
  matches (ties by lower cost, then rule name), until ``k`` rules are
  chosen or nothing new is covered.  Greedy is the standard
  approximation for weighted set cover (ln n factor, Chvátal 1979).

Scale design: rule coverage booleans are computed ONCE — two id-keyed
joins attach both records' key columns to each labeled pair, then every
rule is a cheap column predicate over that one pair table (persisted;
width = Σ key columns, rows = |labels|, which is human-labeled data and
therefore tiny next to the corpus).  Each greedy step is ONE K-row
aggregate over the persisted table + a driver argmax — k steps, never a
per-pair driver loop.  Costs are per-rule ``groupBy(key).count`` +
``Σ n·(n−1)/2`` aggregates over the corpus — the same O(distinct keys)
shape as KeyLinker.key_counts, one shuffle per rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind


def _rule_flags(
    records: DataFrame, labels: DataFrame, rules: dict
) -> DataFrame:
    """→ one row per labeled pair with a boolean ``__cov_<rule>``
    column per rule: True iff every key column of the rule is non-null
    on both sides and equal (SQL-equality blocking semantics)."""
    keyed_cols, flat = [], []
    for name, spec in rules.items():
        cols = bind(records, spec)
        keyed_cols.append((name, [f"__{name}_{i}" for i in range(len(cols))]))
        flat += [
            c.alias(f"__{name}_{i}") for i, c in enumerate(cols)
        ]
    slim = records.select(F.col("record_id"), *flat)
    left = slim.select(
        F.col("record_id").alias("record_id_l"),
        *[F.col(c).alias(f"{c}_l") for _, cs in keyed_cols for c in cs],
    )
    right = slim.select(
        F.col("record_id").alias("record_id_r"),
        *[F.col(c).alias(f"{c}_r") for _, cs in keyed_cols for c in cs],
    )
    pairs = labels.select("record_id_l", "record_id_r").join(
        left, "record_id_l"
    ).join(right, "record_id_r")
    out_cols = []
    for name, cs in keyed_cols:
        flag = F.lit(True)
        for c in cs:
            flag = flag & F.col(f"{c}_l").eqNullSafe(F.col(f"{c}_r")) & F.col(
                f"{c}_l"
            ).isNotNull()
        out_cols.append(flag.alias(f"__cov_{name}"))
    return pairs.select("record_id_l", "record_id_r", *out_cols)


def _rule_costs(records: DataFrame, rules: dict, task: str) -> dict:
    """Corpus-wide candidate-pair count per rule (lazy: K small
    aggregates combined into one collect via unionByName)."""
    parts = []
    for name, spec in rules.items():
        cols = bind(records, spec)
        keyed = records.select(*[c.alias(f"__k{i}") for i, c in enumerate(cols)])
        keyed = keyed.na.drop(subset=[f"__k{i}" for i in range(len(cols))])
        counts = keyed.groupBy(
            *[f"__k{i}" for i in range(len(cols))]
        ).agg(F.count(F.lit(1)).alias("n"))
        if task == "dedupe":
            expr = F.sum(F.col("n") * (F.col("n") - 1) / 2)
        else:
            expr = F.sum(F.col("n") * F.col("n"))
        parts.append(
            counts.agg(
                F.lit(name).alias("rule"),
                expr.cast("long").alias("est_pairs"),
            )
        )
    un = parts[0]
    for p in parts[1:]:
        un = un.unionByName(p)
    return {r["rule"]: (r["est_pairs"] or 0) for r in un.collect()}


def blocking_rule_stats(
    records: DataFrame,
    labels: DataFrame,
    rules: dict,
    *,
    task: str = "dedupe",
) -> DataFrame:
    """→ one row per rule: (rule, covered, n_labels, recall,
    est_pairs) — labeled-match coverage vs corpus-wide candidate
    volume.  ``labels`` is (record_id_l, record_id_r) true matches."""
    flags = _rule_flags(records, labels, rules)
    n_labels = labels.count()
    costs = _rule_costs(records, rules, task)
    agg = flags.agg(
        *[
            F.sum(F.col(f"__cov_{name}").cast("long")).alias(name)
            for name in rules
        ]
    ).first()
    spark = records.sparkSession
    rows = [
        (
            name,
            int(agg[name] or 0),
            int(n_labels),
            (float(agg[name] or 0) / n_labels) if n_labels else 0.0,
            int(costs[name]),
        )
        for name in rules
    ]
    return spark.createDataFrame(
        rows,
        "rule string, covered long, n_labels long, recall double, est_pairs long",
    )


def greedy_blocking_rules(
    records: DataFrame,
    labels: DataFrame,
    rules: dict,
    *,
    k: int = 3,
    task: str = "dedupe",
) -> DataFrame:
    """Greedy weighted set cover → (step, rule, new_covered,
    cum_covered, est_pairs), one row per chosen rule in choice order.
    Each step picks the rule covering the most still-uncovered labeled
    pairs; ties break toward lower ``est_pairs``, then rule name.
    Stops early when no rule covers anything new."""
    flags = _rule_flags(records, labels, rules).persist()
    try:
        flags.count()
        costs = _rule_costs(records, rules, task)
        chosen: list[tuple] = []
        uncovered = flags
        cum = 0
        names = list(rules)
        for step in range(1, min(k, len(names)) + 1):
            remaining = [n for n in names if n not in {c[1] for c in chosen}]
            counts = uncovered.agg(
                *[
                    F.sum(F.col(f"__cov_{n}").cast("long")).alias(n)
                    for n in remaining
                ]
            ).first()
            best = min(
                remaining,
                key=lambda n: (-int(counts[n] or 0), costs[n], n),
            )
            new_cov = int(counts[best] or 0)
            if new_cov == 0:
                break
            cum += new_cov
            chosen.append((step, best, new_cov, cum, int(costs[best])))
            uncovered = uncovered.filter(~F.col(f"__cov_{best}"))
        spark = records.sparkSession
        return spark.createDataFrame(
            chosen,
            "step long, rule string, new_covered long, cum_covered long, "
            "est_pairs long",
        )
    finally:
        flags.unpersist()
