"""Date / timestamp comparison levels — the DOB-style comparer every
record-linkage deployment needs and the reference's lib (email, name,
geo, phone) doesn't ship.  Modeled on splink's date-comparison
template; pure column algebra, no UDFs.

Levels (ordered; best wins):
* ``EXACT`` — same calendar date;
* ``SWAPPED_DAY_MONTH`` — day and month transposed, same year — the
  classic keyboard/locale entry error (03/07 vs 07/03), only
  meaningful when the swap forms a real, DIFFERENT date;
* ``SAME_MONTH_YEAR`` — day differs, month+year agree (day-level
  typo / day unknown and defaulted);
* ``WITHIN_N_DAYS`` — calendar distance ≤ ``n_days`` (off-by-one
  entry, timezone shifts of a crawl timestamp);
* ``ELSE``.

Null on either side → ``ELSE`` (no evidence, parity with the other
lib comparers).  Works on DATE or TIMESTAMP columns (timestamps are
compared by their calendar date; use ``within_seconds`` on raw
timestamps when sub-day resolution matters, e.g. recrawl ``warc_ts``
windows).
"""

from __future__ import annotations

from enum import IntEnum

from pyspark.sql import Column
from pyspark.sql import functions as F


class DateMatchLevel(IntEnum):
    EXACT = 0
    SWAPPED_DAY_MONTH = 1
    SAME_MONTH_YEAR = 2
    WITHIN_N_DAYS = 3
    ELSE = 4


def match_level(d1: Column, d2: Column, *, n_days: int = 7) -> Column:
    """int level per :class:`DateMatchLevel` for two date/timestamp
    columns."""
    a, b = F.to_date(d1), F.to_date(d2)
    exact = a == b
    # day↔month transposition needs no date construction (which would
    # throw under ANSI for impossible dates): b is already a REAL
    # date, so the swap holds iff its fields mirror a's
    swap = (
        (a != b)
        & (F.year(a) == F.year(b))
        & (F.dayofmonth(b) == F.month(a))
        & (F.month(b) == F.dayofmonth(a))
    )
    same_my = (F.year(a) == F.year(b)) & (F.month(a) == F.month(b))
    within = F.abs(F.datediff(a, b)) <= F.lit(int(n_days))
    return (
        F.when(a.isNull() | b.isNull(), F.lit(int(DateMatchLevel.ELSE)))
        .when(exact, F.lit(int(DateMatchLevel.EXACT)))
        .when(swap, F.lit(int(DateMatchLevel.SWAPPED_DAY_MONTH)))
        .when(same_my, F.lit(int(DateMatchLevel.SAME_MONTH_YEAR)))
        .when(within, F.lit(int(DateMatchLevel.WITHIN_N_DAYS)))
        .otherwise(F.lit(int(DateMatchLevel.ELSE)))
    )


def within_seconds(t1: Column, t2: Column, n_seconds: int) -> Column:
    """boolean: |t1 − t2| ≤ n_seconds on raw timestamps (sub-day
    resolution for crawl-timestamp windows); NULL-safe false."""
    diff = F.abs(
        F.unix_timestamp(t1).cast("long") - F.unix_timestamp(t2).cast("long")
    )
    return F.coalesce(diff <= F.lit(int(n_seconds)), F.lit(False))
