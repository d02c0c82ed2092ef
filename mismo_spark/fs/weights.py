"""Fellegi-Sunter model parameters and scoring.

Semantics of mismo/fs/_weights.py:21-391: per comparison dimension, per
agreement level, ``m = P(level | match)`` and ``u = P(level | non-match)``;
``odds = m/u`` (inf when u=0); total odds of a pair = product of its
per-dimension odds.

Weights are plain Python (they're tiny) and get *baked into the scoring
expression as literals* — the Spark analogue of a broadcast variable,
with zero runtime lookup cost: scoring is one ``F.when`` chain per
dimension inside whole-stage codegen.
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass


@dataclass(frozen=True)
class LevelWeights:
    """m/u for one agreement level (mismo/fs/_weights.py:21-89)."""

    name: str
    m: float
    u: float

    @property
    def odds(self) -> float:
        if self.u == 0:
            return math.inf
        return self.m / self.u

    @property
    def log_odds(self) -> float:
        if self.odds == 0:
            return -math.inf
        return math.log10(self.odds)


class ComparerWeights:
    """Weights for all levels of one dimension (mismo/fs/_weights.py:170-194)."""

    def __init__(self, name: str, level_weights: list[LevelWeights]) -> None:
        self.name = name
        self.level_weights = list(level_weights)

    def __getitem__(self, key: str | int) -> LevelWeights:
        if isinstance(key, int):
            return self.level_weights[key]
        for lw in self.level_weights:
            if lw.name == key:
                return lw
        raise KeyError(key)

    def odds(self, level: str | int) -> float:
        return self[level].odds

    def odds_column(self, label_col):
        """label column → odds column (CASE over levels), NaN for
        unknown labels (mismo/fs/_weights.py:170-194)."""
        from pyspark.sql import functions as F

        out = None
        for i, lw in enumerate(self.level_weights):
            o = lw.odds
            lit = F.lit(float("inf")) if math.isinf(o) else F.lit(float(o))
            out = F.when(label_col == i, lit) if out is None else out.when(label_col == i, lit)
        return out.otherwise(F.lit(float("nan")))


class Weights:
    """The full model: one ComparerWeights per dimension
    (mismo/fs/_weights.py:269-391)."""

    def __init__(self, comparer_weights: list[ComparerWeights]) -> None:
        self.comparers = list(comparer_weights)

    def __getitem__(self, name: str) -> ComparerWeights:
        for cw in self.comparers:
            if cw.name == name:
                return cw
        raise KeyError(name)

    def __iter__(self):
        return iter(self.comparers)

    def score_compared(self, compared):
        """Add per-dimension `{dim}_odds`, total `odds`,
        `match_probability` = odds/(1+odds), `log_odds` = log10(odds)
        (mismo/fs/_weights.py:269-331, mismo/fs/_util.py:37-60).
        One projection; no shuffle.
        """
        return _score_compared(self, compared)

    # -- JSON serde (mismo/fs/_weights.py:349-391) -----------------------

    def to_dict(self) -> dict:
        return {
            cw.name: {lw.name: {"m": lw.m, "u": lw.u} for lw in cw.level_weights}
            for cw in self.comparers
        }

    def to_json(self, path: str | None = None) -> str:
        s = json.dumps(self.to_dict(), indent=2)
        if path is not None:
            with open(path, "w") as f:
                f.write(s)
        return s

    @staticmethod
    def from_dict(d: dict) -> "Weights":
        return Weights(
            [
                ComparerWeights(
                    cname,
                    [LevelWeights(lname, mu["m"], mu["u"]) for lname, mu in levels.items()],
                )
                for cname, levels in d.items()
            ]
        )

    @staticmethod
    def from_json(s_or_path: str) -> "Weights":
        try:
            d = json.loads(s_or_path)
        except (json.JSONDecodeError, ValueError):
            with open(s_or_path) as f:
                d = json.load(f)
        return Weights.from_dict(d)


def _score_compared(weights: "Weights", compared, odds_adjust=None):
    """The one scoring loop behind ``Weights.score_compared`` and
    ``fs.tf_adjust.score_compared_tf`` — ``odds_adjust(cw, odds)`` may
    wrap each comparer's odds column (e.g. TF adjustment) so the two
    scorers cannot drift."""
    from pyspark.sql import functions as F

    df = compared
    total = F.lit(1.0)
    for cw in weights:
        odds = cw.odds_column(F.col(cw.name))
        if odds_adjust is not None:
            odds = odds_adjust(cw, odds)
        df = df.withColumn(f"{cw.name}_odds", odds)
        total = total * F.col(f"{cw.name}_odds")
    df = df.withColumn("odds", total)
    df = df.withColumn(
        "match_probability", F.col("odds") / (F.lit(1.0) + F.col("odds"))
    )
    return df.withColumn("log_odds", F.log10(F.col("odds")))


def score_waterfall(scored: DataFrame, weights: "Weights") -> DataFrame:
    """Long-format per-dimension evidence breakdown of a scored pair
    table (splink's waterfall-chart data): one row per (pair,
    dimension) with the fired level's index, its odds, and the log2
    Bayes factor, plus one 'total' row per pair.

    Pure unpivot of columns ``score_compared`` already computed — a
    stack projection, no shuffle, no re-scoring.
    """
    from pyspark.sql import functions as F

    parts = []
    for cw in weights:
        parts.append(
            scored.select(
                "record_id_l",
                "record_id_r",
                F.lit(cw.name).alias("dimension"),
                F.col(cw.name).cast("long").alias("level"),
                F.col(f"{cw.name}_odds").alias("odds"),
                F.log2(f"{cw.name}_odds").alias("log2_bf"),
            )
        )
    total = scored.select(
        "record_id_l",
        "record_id_r",
        F.lit("total").alias("dimension"),
        F.lit(None).cast("long").alias("level"),
        F.col("odds").alias("odds"),
        F.log2("odds").alias("log2_bf"),
    )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.unionByName(total)
