"""one_to_one_links / mutual_best_links — greedy 1:1 assignment.

The ground truth is the sequential greedy scan in
(score DESC, id_l ASC, id_r ASC) order, implemented in ~10 lines of
Python below; the distributed locally-dominant-edge rounds must match
it bit-for-bit on every input, including adversarial descending chains
and all-tied score blocks.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mismo_spark.linker.assignment import mutual_best_links, one_to_one_links

SCHEMA = "record_id_l long, record_id_r long, score double"


def greedy_py(rows):
    """Sequential greedy matching under the module's total order."""
    used_l, used_r, out = set(), set(), []
    for l, r, s in sorted(rows, key=lambda t: (-t[2], t[0], t[1])):
        if l not in used_l and r not in used_r:
            used_l.add(l)
            used_r.add(r)
            out.append((l, r, s))
    return sorted(out)


def run(spark, rows, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    got = one_to_one_links(df, "score", **kw)
    return sorted(tuple(r) for r in got.collect())


def test_simple_chain(spark):
    # descending path a-b-c-d: greedy takes (1,10) then (3,12)
    rows = [(1, 10, 5.0), (1, 11, 4.0), (2, 11, 3.0), (2, 12, 2.0), (3, 12, 1.0)]
    assert run(spark, rows) == [(1, 10, 5.0), (2, 11, 3.0), (3, 12, 1.0)]
    assert run(spark, rows) == greedy_py(rows)


def test_all_tied_scores_break_on_ids(spark):
    rows = [(l, r, 1.0) for l in range(1, 5) for r in range(10, 14)]
    # ties resolve by (id_l, id_r): the diagonal in id order
    assert run(spark, rows) == [(1, 10, 1.0), (2, 11, 1.0), (3, 12, 1.0), (4, 13, 1.0)]
    assert run(spark, rows) == greedy_py(rows)


def test_long_descending_chain_needs_many_rounds(spark):
    # alternating path (l and r shared by consecutive edges) with
    # strictly descending scores forces ~k/2 dominant-edge rounds
    rows = [((k + 1) // 2, 100 + k // 2, float(50 - k)) for k in range(20)]
    assert run(spark, rows) == greedy_py(rows)


def test_randomized_equivalence(spark):
    rng = random.Random(7)
    seen = set()
    rows = []
    for _ in range(300):
        pair = (rng.randrange(40), 100 + rng.randrange(40))
        if pair in seen:
            continue
        seen.add(pair)
        rows.append((*pair, round(rng.random() * 10, 3)))
    assert run(spark, rows) == greedy_py(rows)


def test_output_is_one_to_one(spark):
    rng = random.Random(11)
    rows = list(
        {
            (rng.randrange(25), 100 + rng.randrange(25)): None
            for _ in range(200)
        }
    )
    rows = [(l, r, float((l * 7 + r) % 13)) for l, r in rows]
    got = run(spark, rows)
    assert len({l for l, _, _ in got}) == len(got)
    assert len({r for _, r, _ in got}) == len(got)
    # maximality: no remaining pair has both endpoints free
    used_l = {l for l, _, _ in got}
    used_r = {r for _, r, _ in got}
    assert not [t for t in rows if t[0] not in used_l and t[1] not in used_r]


def test_null_scores_rejected_and_empty_input(spark):
    rows = [(1, 10, None), (1, 11, 2.0)]
    assert run(spark, rows) == [(1, 11, 2.0)]
    assert run(spark, []) == []


def test_extra_columns_preserved(spark):
    df = spark.createDataFrame(
        [(1, 10, 5.0, "rule_a"), (1, 11, 4.0, "rule_b")],
        SCHEMA + ", rule string",
    )
    got = one_to_one_links(df, "score")
    assert got.columns == ["record_id_l", "record_id_r", "score", "rule"]
    assert [tuple(r) for r in got.collect()] == [(1, 10, 5.0, "rule_a")]


def test_checkpoint_dir_resume_identical(spark, tmp_path):
    rows = [((k + 1) // 2, 100 + k // 2, float(50 - k)) for k in range(12)]
    a = run(spark, rows)
    b = run(spark, rows, checkpoint_dir=str(tmp_path / "chk"))
    assert a == b == greedy_py(rows)


def test_max_rounds_raises(spark):
    rows = [((k + 1) // 2, 100 + k // 2, float(50 - k)) for k in range(20)]
    with pytest.raises(RuntimeError, match="converge"):
        run(spark, rows, max_rounds=2)


def test_mutual_best_is_round_one_subset(spark):
    rows = [(1, 10, 5.0), (1, 11, 4.0), (2, 11, 3.0), (2, 12, 2.0), (3, 12, 1.0)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(tuple(r) for r in mutual_best_links(df, "score").collect())
    # only (1,10) is rank-1 on both sides in round 1
    assert got == [(1, 10, 5.0)]
    full = run(spark, rows)
    assert set(got) <= set(full)


def test_missing_score_col_raises(spark):
    df = spark.createDataFrame([(1, 10, 1.0)], SCHEMA)
    with pytest.raises(ValueError, match="no column"):
        one_to_one_links(df, "odds")


# --- dedupe (shared id space) regime ---------------------------------------


def greedy_py_dedupe(rows):
    """Sequential greedy with ONE shared used-record set: a record
    matched in either orientation is removed (the general-graph rule)."""
    used, out = set(), []
    for l, r, s in sorted(rows, key=lambda t: (-t[2], t[0], t[1])):
        if l != r and l not in used and r not in used:
            used.add(l)
            used.add(r)
            out.append((l, r, s))
    return sorted(out)


def test_dedupe_shared_id_not_matched_twice(spark):
    # the r4 ADVICE counterexample: record 2 appears as r of (1,2) and
    # l of (2,3); side-partitioned windows would accept both — the
    # node-symmetric rounds must accept only (1,2), like sequential
    # greedy with a shared used set
    rows = [(1, 2, 0.9), (2, 3, 0.8), (1, 3, 0.7)]
    got = run(spark, rows, dedupe=True)
    assert got == [(1, 2, 0.9)] == greedy_py_dedupe(rows)
    # auto-detection: ids overlap across sides -> same result unflagged
    assert run(spark, rows) == got


def test_dedupe_randomized_equivalence(spark):
    rng = random.Random(3)
    seen = set()
    rows = []
    for _ in range(400):
        a, b = rng.randrange(60), rng.randrange(60)
        if a == b:
            continue
        pair = (min(a, b), max(a, b))
        if pair in seen:
            continue
        seen.add(pair)
        rows.append((*pair, round(rng.random() * 10, 3)))
    got = run(spark, rows, dedupe=True)
    assert got == greedy_py_dedupe(rows)
    # 1:1 across BOTH orientations: every record id appears at most once
    ids = [i for l, r, _ in got for i in (l, r)]
    assert len(ids) == len(set(ids))


def test_dedupe_tied_scores_and_chain(spark):
    rows = [(k, k + 1, float(50 - k)) for k in range(15)]  # path graph
    assert run(spark, rows, dedupe=True) == greedy_py_dedupe(rows)
    tied = [(l, r, 1.0) for l in range(6) for r in range(6) if l < r]
    assert run(spark, tied, dedupe=True) == greedy_py_dedupe(tied)


def test_dedupe_self_and_duplicate_pairs_dropped(spark):
    rows = [(5, 5, 9.0), (1, 2, 3.0), (1, 2, 1.0)]
    assert run(spark, rows, dedupe=True) == [(1, 2, 3.0)]


def test_mutual_best_dedupe(spark):
    rows = [(1, 2, 0.9), (2, 3, 0.8), (1, 3, 0.7)]
    df = spark.createDataFrame(rows, SCHEMA)
    got = sorted(tuple(r) for r in mutual_best_links(df, "score", dedupe=True).collect())
    # (2,3) is rank-2 at node 2 (behind (1,2)) -> only (1,2) is mutual
    assert got == [(1, 2, 0.9)]
    # auto-detect agrees
    auto = sorted(tuple(r) for r in mutual_best_links(df, "score").collect())
    assert auto == got


def test_bipartite_explicit_flag_matches_default(spark):
    rows = [(1, 10, 5.0), (1, 11, 4.0), (2, 11, 3.0), (2, 12, 2.0), (3, 12, 1.0)]
    assert run(spark, rows, dedupe=False) == run(spark, rows) == greedy_py(rows)


def test_round_partitions_clamps_and_restores(spark):
    """RoundPartitions must only ever clamp DOWN from the ambient
    setting, track the live row count, and restore exactly."""
    from mismo_spark._util import RoundPartitions

    ambient = spark.conf.get("spark.sql.shuffle.partitions")
    rp = RoundPartitions(spark, rows_per_partition=1000)
    try:
        assert rp.adapt(1) == 1
        assert spark.conf.get("spark.sql.shuffle.partitions") == "1"
        # ceil(2500/1000) = 3, capped at the ambient setting
        assert rp.adapt(2500) == min(3, int(ambient))
        # never above ambient, however large the relation
        assert rp.adapt(10**12) == int(ambient)
        assert spark.conf.get("spark.sql.shuffle.partitions") == ambient
    finally:
        rp.restore()
    assert spark.conf.get("spark.sql.shuffle.partitions") == ambient
