"""Blocking-rule learning (mismo_spark/linker/learn.py): coverage
stats and greedy set cover over a hand-computed corpus.

Corpus: 6 records, labels = {(0,1), (2,3), (4,5)}.
  rule "city":  0,1 share "nyc"; 2,3 share "sf"; 4 "la", 5 NULL
      → covers (0,1), (2,3); est_pairs: nyc C(2,2)=1, sf 1, la 0 → 2
  rule "zip":   0,1 share 10001; 4,5 share 90001; 2: 94101, 3: 94102
      → covers (0,1), (4,5); est_pairs: 1 + 1 = 2
  rule "name1": only 2,3 share first letter "b" (alice/elyce,
      carol/karole differ) → covers (2,3); est_pairs 1
Greedy k=3: step1 tie city/zip at 2 covered, cost tie at 2 → name asc
→ "city"; step2 remaining uncovered {(4,5)}: zip covers it (name1
doesn't) → "zip"; step3 nothing uncovered → stop at 2 rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mismo_spark.linker.learn import blocking_rule_stats, greedy_blocking_rules

RECORDS = [
    # record_id, city, zip, name
    (0, "nyc", 10001, "alice"),
    (1, "nyc", 10001, "elyce"),
    (2, "sf", 94101, "bob"),
    (3, "sf", 94102, "bobby"),
    (4, "la", 90001, "carol"),
    (5, None, 90001, "karole"),
]
LABELS = [(0, 1), (2, 3), (4, 5)]
RULES = {
    "city": "city",
    "zip": "zip",
    "name1": lambda df: F.substring(df["name"], 1, 1),
}


def _dfs(spark):
    recs = spark.createDataFrame(
        RECORDS, "record_id long, city string, zip long, name string"
    )
    labels = spark.createDataFrame(
        LABELS, "record_id_l long, record_id_r long"
    )
    return recs, labels


def test_stats(spark):
    recs, labels = _dfs(spark)
    rows = {
        r.rule: r
        for r in blocking_rule_stats(recs, labels, RULES).collect()
    }
    assert rows["city"].covered == 2 and rows["city"].est_pairs == 2
    assert rows["zip"].covered == 2 and rows["zip"].est_pairs == 2
    assert rows["name1"].covered == 1 and rows["name1"].est_pairs == 1
    assert rows["city"].n_labels == 3
    assert rows["city"].recall == 2 / 3


def test_greedy_order_and_early_stop(spark):
    recs, labels = _dfs(spark)
    out = greedy_blocking_rules(recs, labels, RULES, k=3).collect()
    assert [(r.step, r.rule, r.new_covered, r.cum_covered) for r in out] == [
        (1, "city", 2, 2),
        (2, "zip", 1, 3),
    ]


def test_greedy_respects_k(spark):
    recs, labels = _dfs(spark)
    out = greedy_blocking_rules(recs, labels, RULES, k=1).collect()
    assert len(out) == 1 and out[0].rule == "city"


def test_null_key_never_covers(spark):
    recs, labels = _dfs(spark)
    stats = {
        r.rule: r
        for r in blocking_rule_stats(
            recs, labels, {"city": "city"}
        ).collect()
    }
    # (4,5) has a NULL city on one side — not covered even though
    # eqNullSafe(NULL, 'la') is a defined False and NULL=NULL pairs
    # must not block together either
    assert stats["city"].covered == 2
