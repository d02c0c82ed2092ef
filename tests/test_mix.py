"""Training-mix composition: quotas and token budgets."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mismo_spark.mix import token_budget_sample, top_k_per_group


def _docs(spark):
    rows = [
        (i, "a" if i < 20 else "b", float(i % 5), 10 + (i % 3))
        for i in range(30)
    ]
    return spark.createDataFrame(
        rows, "record_id long, lang string, quality double, n_tokens long"
    )


def test_top_k_prefers_order_and_is_deterministic(spark):
    df = _docs(spark)
    out = top_k_per_group(
        df, ["lang"], k=3, order_by=[F.col("quality").desc()]
    )
    rows = out.collect()
    per = {}
    for r in rows:
        per.setdefault(r["lang"], []).append(r)
    assert len(per["a"]) == 3 and len(per["b"]) == 3
    # all survivors have the top quality value available in their group
    assert all(r["quality"] == 4.0 for r in per["a"])
    again = top_k_per_group(
        df, ["lang"], k=3, order_by=[F.col("quality").desc()]
    ).collect()
    assert sorted(r["record_id"] for r in rows) == sorted(
        r["record_id"] for r in again
    )


def test_top_k_small_group_survives_whole(spark):
    df = _docs(spark).where(F.col("record_id") < 2)
    assert top_k_per_group(df, ["lang"], k=10).count() == 2


def test_token_budget_per_group(spark):
    df = _docs(spark)
    out = token_budget_sample(df, 25, by=["lang"], id_col="record_id")
    rows = out.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        total = sum(r["n_tokens"] for r in rs)
        # crossed the budget, and removing the last (largest
        # tokens_before) row drops below it
        assert total >= 25
        last = max(rs, key=lambda r: r["tokens_before"])
        assert last["tokens_before"] < 25
        assert total - last["n_tokens"] < 25


def test_token_budget_matches_python_replay(spark):
    df = _docs(spark)
    out = token_budget_sample(df, 25, by=["lang"], id_col="record_id")
    got = sorted(r["record_id"] for r in out.collect())
    rows = df.collect()
    want = []
    for lang in ("a", "b"):
        grp = sorted(
            (r for r in rows if r["lang"] == lang),
            key=lambda r: hashlib.md5(
                f"{r['record_id']}|42".encode()
            ).hexdigest(),
        )
        acc = 0
        for r in grp:
            if acc < 25:
                want.append(r["record_id"])
            acc += r["n_tokens"]
    assert got == sorted(want)


def test_validation(spark):
    df = _docs(spark)
    with pytest.raises(ValueError):
        top_k_per_group(df, ["lang"], k=0)
    with pytest.raises(ValueError):
        token_budget_sample(df, 0)


def _py_temperature_alloc(sizes: dict, total: int, alpha: float) -> dict:
    import math

    wsum = sum(n ** alpha for n in sizes.values())
    ideal = {g: round(total * (n ** alpha) / wsum, 6) for g, n in sizes.items()}
    base = {g: math.floor(x) for g, x in ideal.items()}
    deficit = total - sum(base.values())
    order = sorted(sizes, key=lambda g: (-(ideal[g] - base[g]), g))
    for g in order[:deficit]:
        base[g] += 1
    return {g: min(base[g], sizes[g]) for g in sizes}


def test_temperature_sample_allocation(spark):
    from mismo_spark.mix import temperature_sample

    rows = []
    sizes = {"big": 300, "mid": 60, "tiny": 6}
    i = 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    df = spark.createDataFrame(rows, "record_id long, lang string")

    # alpha=1: natural proportions
    nat = temperature_sample(df, ["lang"], total=61, alpha=1.0)
    got = {r["lang"]: 0 for r in nat.collect()}
    for r in nat.collect():
        got[r["lang"]] = got.get(r["lang"], 0) + 1
    assert got == _py_temperature_alloc(sizes, 61, 1.0)
    assert sum(got.values()) == 61

    # alpha=0.3: flattened -> tiny group over-represented vs natural
    flat = temperature_sample(df, ["lang"], total=61, alpha=0.3)
    fg = {}
    for r in flat.collect():
        fg[r["lang"]] = fg.get(r["lang"], 0) + 1
    assert fg == _py_temperature_alloc(sizes, 61, 0.3)
    assert fg["tiny"] > got["tiny"]
    assert fg["big"] < got["big"]
    # audit columns present and consistent
    row = flat.collect()[0]
    assert row["n_group"] == sizes[row["lang"]]

    # cap: a tiny group asked for more rows than it has undershoots
    cap = temperature_sample(df, ["lang"], total=300, alpha=0.01)
    cg = {}
    for r in cap.collect():
        cg[r["lang"]] = cg.get(r["lang"], 0) + 1
    assert cg["tiny"] == 6  # capped at group size
    assert sum(cg.values()) <= 300


def test_temperature_sample_deterministic(spark):
    from mismo_spark.mix import temperature_sample

    df = spark.createDataFrame(
        [(i, "g" + str(i % 3)) for i in range(90)],
        "record_id long, lang string",
    )
    a = {r["record_id"] for r in
         temperature_sample(df, ["lang"], total=30, alpha=0.5).collect()}
    b = {r["record_id"] for r in
         temperature_sample(df, ["lang"], total=30, alpha=0.5).collect()}
    assert a == b and len(a) == 30
    import pytest as _p
    with _p.raises(ValueError, match="alpha"):
        temperature_sample(df, ["lang"], total=10, alpha=1.5)
    with _p.raises(ValueError, match="total"):
        temperature_sample(df, ["lang"], total=0, alpha=0.5)
