"""NameBlocker: block on every cross of name-part keys.

Semantics of mismo/lib/name/_blocker.py:12-104 — a 6×6 cross of name
struct parts (given↔surname catches swapped names etc.), each as a fast
equi-join, unioned distinct.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mismo_spark._util import bind_one
from mismo_spark.linker.key import KeyLinker
from mismo_spark.types.linkage import ID_L, ID_R, Linkage

NAME_PARTS = ["prefix", "given", "middle", "surname", "suffix", "nickname"]


class NameBlocker:
    def __init__(
        self,
        *,
        column=None,
        column_left=None,
        column_right=None,
        max_pairs: int | None = 100_000,
        task: str | None = None,
    ) -> None:
        if column is not None:
            if column_left is not None or column_right is not None:
                raise ValueError("specify either column or column_left+column_right")
            column_left = column_right = column
        elif column_left is None or column_right is None:
            raise ValueError("specify either column or column_left+column_right")
        self.column_left = column_left
        self.column_right = column_right
        self.max_pairs = max_pairs
        self.task = task

    def __call__(self, left: DataFrame, right: DataFrame | None = None) -> Linkage:
        if right is None:
            right = left

        def norm(struct_col, part):
            # empty parts never match (nullif '' — the reference relies
            # on max_pairs to drop the '' mega-key; nulling is cheaper
            # and equivalent for any sane budget)
            return F.nullif(F.upper(F.trim(struct_col[part])), F.lit(""))

        parts_links = []
        for pl in NAME_PARTS:
            for pr in NAME_PARTS:
                lk = KeyLinker(
                    [
                        (
                            lambda df, p=pl: norm(bind_one(df, self.column_left), p),
                            lambda df, p=pr: norm(bind_one(df, self.column_right), p),
                        )
                    ],
                    max_pairs=self.max_pairs,
                    task=self.task,
                )
                parts_links.append(lk(left, right).links.select(ID_L, ID_R))
        unioned = reduce(DataFrame.unionByName, parts_links).distinct()
        return Linkage(left=left, right=right, links=unioned)
