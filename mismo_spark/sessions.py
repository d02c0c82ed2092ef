"""User-activity sessionization over event tables/streams.

No reference counterpart (mismo has no event tooling) — this is the
training-data-pipeline side of the engine: sessionization is the
standard first aggregation over web logs / crawl telemetry, and at
100 TB it must be one shuffle on the user key, which both forms below
are.

Two forms:
* :func:`sessionize` — label every event with a per-user session
  ordinal (gap-based: a new session starts when the gap from the
  user's previous event EXCEEDS ``gap_seconds``).  Pure window
  algebra: one shuffle on the user key, two stacked windows over the
  same sort — Catalyst evaluates both in a single Window operator.
* :func:`session_stats` — per-session aggregates via Spark's native
  ``F.session_window`` (gap-merged event-time windows).  Works in
  batch AND Structured Streaming (add a watermark; state is bounded
  by open sessions).  Note the boundary difference: ``session_window``
  merges only strictly-overlapping windows, so a gap EXACTLY equal to
  the duration starts a new session (``>=``), while ``sessionize``
  keeps it (``>``) — both oracles replay their own semantics.

Determinism: lag/cumsum over (ts) alone is nondeterministic under
equal timestamps, so both the window order and the oracle take an
explicit ``tiebreak_col``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    session_col: str = "session_id",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Events + a per-user session ordinal (1-based, in time order).

    A new session starts when ``ts − prev_ts > gap_seconds`` (strict).
    Interval arithmetic on the timestamps themselves — timezone-free,
    works for TIMESTAMP and TIMESTAMP_NTZ alike, exact cross-engine
    (DuckDB replays ``ts - prev > INTERVAL n SECONDS`` verbatim).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(user_col).orderBy(*order)
    ts = F.col(ts_col)
    prev = F.lag(ts).over(w)
    gap = F.expr(f"INTERVAL {int(gap_seconds)} SECONDS")
    new_session = (prev.isNull() | ((ts - prev) > gap)).cast("long")
    cum = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn(session_col, F.sum(new_session).over(cum))


def session_stats(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    agg_exprs: list | None = None,
) -> DataFrame:
    """Per-session aggregates via ``F.session_window`` →
    (user, session_start, session_end, n_events, *aggs).

    ``session_end`` is Spark's window end = last event ts + gap (the
    gap-extended bound, not the last event).  In a stream, call
    ``df.withWatermark(ts_col, ...)`` first; sessions close when the
    watermark passes their end, so state stays bounded.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")] + list(agg_exprs or [])
    win = F.session_window(F.col(ts_col), gap)
    out = df.groupBy(F.col(user_col), win).agg(*aggs)
    rest = [c for c in out.columns if c not in (user_col, "session_window")]
    return out.select(
        user_col,
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *rest,
    )
