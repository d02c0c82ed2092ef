"""JoinLinker: arbitrary boolean blocking condition + slow-join guard.

Semantics of mismo/linker/_join_linker.py:13-68 and the plan-inspection
guard of mismo/joins/_analyze.py:13-153 / mismo/_explain.py:9-37.

Catalyst silently falls back to BroadcastNestedLoopJoin / CartesianProduct
for non-equi conditions — O(n·m) at web scale.  ``check_join_plan``
inspects the *optimized physical plan string* and raises ``SlowJoinError``
before any job is submitted.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame

from mismo_spark.linker.base import make_linkage
from mismo_spark.types.linkage import Linkage

from mismo_spark.exceptions import SlowJoinError, SlowJoinWarning

_SLOW_MARKERS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def check_join_plan(df: DataFrame, on_slow: str = "error") -> None:
    """Raise/warn if the physical plan contains a nested-loop or
    cartesian join (mismo/joins/_analyze.py:13-153)."""
    if on_slow == "ignore":
        return
    plan = df._jdf.queryExecution().executedPlan().toString()
    hits = [m for m in _SLOW_MARKERS if m in plan]
    if hits:
        msg = f"join would execute as {hits[0]} (O(n*m)); rewrite as equi-join"
        if on_slow == "error":
            raise SlowJoinError(msg, algorithm=hits[0])
        import warnings

        warnings.warn(SlowJoinWarning(msg, algorithm=hits[0]))


class JoinLinker:
    """Link on an arbitrary condition ``f(left, right) -> Column``."""

    def __init__(
        self,
        condition: Callable[[DataFrame, DataFrame], Column],
        *,
        task: str | None = None,
        on_slow: str = "error",
    ) -> None:
        self.condition = condition
        self.task = task
        self.on_slow = on_slow

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        if right is None:
            right = left
        linkage = make_linkage(left, right, self.condition, self.task)
        check_join_plan(linkage.links, self.on_slow)
        return linkage
