"""EnumComparer: ordered (condition, level) cases → agreement-level label.

Semantics of mismo/compare/_enum_comparer.py:14-81: one labelled
dimension of the comparison vector; first matching case wins; rows
matching nothing get the ELSE level (highest index).

Spark shape: one ``least(when(c0,0), when(c1,1), …, lit(else))``
projection per dimension — Catalyst collapses all comparers into one
whole-stage-codegen pass over the pairs table, so adding dimensions
costs no extra scans, and the unconditional condition evaluation lets
codegen subexpression-eliminate shared feature expressions across
levels (a chained CASE WHEN evaluates condition k inside branch k's
scope, defeating CSE — measured 2.8× on the flagship compare stage;
see ``label_column``).  Labels are ints (the native repr,
mismo/compare/_enum_comparer.py:44-78); ``level_names`` maps them back
for humans.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class LevelCase:
    name: str
    condition: Callable[[DataFrame], Column] | Column


class EnumComparer:
    """One comparison dimension with ordered agreement levels."""

    ELSE = "else"

    def __init__(self, name: str, cases: Sequence[LevelCase | tuple]) -> None:
        self.name = name
        self.cases = [c if isinstance(c, LevelCase) else LevelCase(*c) for c in cases]
        if any(c.name == self.ELSE for c in self.cases):
            raise ValueError("'else' is implicit; don't declare it")

    @property
    def level_names(self) -> list[str]:
        return [c.name for c in self.cases] + [self.ELSE]

    @property
    def else_index(self) -> int:
        return len(self.cases)

    def label_column(self, pairs: DataFrame) -> Column:
        """First matching case wins — built as
        ``least(when(c0, 0), when(c1, 1), ..., lit(else_index))``
        rather than a chained CASE WHEN.

        The two forms are equivalent for pure conditions (an unmatched
        ``when`` yields NULL, which ``least`` skips; the matched index
        set's minimum IS the first match), but the plan shape differs
        critically: a CASE chain evaluates condition k only when
        conditions <k failed, so when the conditions reference
        expensive projected columns (the pair_features similarities),
        whole-stage codegen CANNOT subexpression-eliminate across the
        conditional branches and re-evaluates the full feature
        expression once per level — measured 2.8× on the flagship
        compare stage (sum of isolated features 32 s vs 90 s fused).
        ``least`` evaluates every condition unconditionally, so the
        shared subexpressions are hoisted and each similarity is
        computed exactly once per row.  Requires conditions to be
        evaluable on every row (always true for comparisons; Catalyst
        gives no cross-condition evaluation-order guarantee anyway)."""
        whens = []
        for i, case in enumerate(self.cases):
            cond = case.condition(pairs) if callable(case.condition) else case.condition
            whens.append(F.when(cond, F.lit(i)))
        if not whens:
            return F.lit(self.else_index)
        return F.least(*whens, F.lit(self.else_index))

    def __call__(self, pairs: DataFrame) -> DataFrame:
        """Append this dimension's label column to the pairs table."""
        return pairs.withColumn(self.name, self.label_column(pairs))


def compare(pairs: DataFrame, comparers: Sequence[EnumComparer]) -> DataFrame:
    """Apply all comparers in one projection (single codegen pass)."""
    return pairs.select(
        "*", *[c.label_column(pairs).alias(c.name) for c in comparers]
    )
