"""Gap-based sessionization — assign session ids to event streams.

A session ends when the gap to the next event of the same key exceeds
`gap`. Pure window algebra (no UDF, no iteration): one lag to mark
session starts, one running sum to number them — both over the SAME
(key, time) window, so Catalyst plans a single hash exchange + sort for
the whole operator. The batch twin of Structured Streaming's
F.session_window aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key: str = "user_id",
    time: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Add `session_id` (per-key, 1-based, in time order) and
    `session_start` flag to each event."""
    order = [F.col(time).asc()] + ([F.col(tiebreak).asc()] if tiebreak else [])
    w = Window.partitionBy(key).orderBy(*order)
    prev_ts = F.lag(F.col(time)).over(w)
    # exact integer-microsecond arithmetic: a float-seconds comparison can
    # flip on exact-gap boundaries and diverge across engines
    gap_us = F.lit(int(gap_seconds) * 1_000_000)
    is_start = (
        prev_ts.isNull() | (F.unix_micros(F.col(time)) - F.unix_micros(prev_ts) > gap_us)
    ).cast("int")
    run = Window.partitionBy(key).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return events.withColumn("session_start", is_start).withColumn(
        "session_id", F.sum("session_start").over(run)
    )


def session_stats(
    events: DataFrame,
    key: str = "user_id",
    time: str = "ts",
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """One row per (key, session): bounds, event count, duration seconds."""
    s = sessionize(events, key, time, gap_seconds, tiebreak)
    return s.groupBy(key, "session_id").agg(
        F.min(time).alias("session_start_ts"),
        F.max(time).alias("session_end_ts"),
        F.count(F.lit(1)).alias("n_events"),
        # exact micros diff, then one division — identical across engines
        ((F.unix_micros(F.max(time)) - F.unix_micros(F.min(time))) / 1_000_000.0).alias(
            "duration_sec"
        ),
    )
