"""Gap-based sessionization — the batch counterpart of the streaming
session windows (streaming/windows.py), and a staple of training-data
pipelines (turning raw event logs into per-session examples).

Semantics: events of one user, ordered by (ts, tiebreak), start a new
session whenever the gap to the previous event exceeds ``gap_seconds``
(strictly). Session ids are 1-based sequence numbers per user, so they
are deterministic and replay-stable (no global counters).

Scale shape: one hash shuffle on the user key for the lag/cumsum
windows (both windows share the same partitioning → one Exchange), then
a keyed aggregation. No global ordering, no driver involvement; skewed
users are AQE's skew-join/agg problem, same class as any keyed window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def with_session_seq(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Tag each event with ``session_seq`` (1-based per user)."""
    # Parquet event times may arrive as TIMESTAMP_NTZ; unix_micros only
    # accepts TIMESTAMP. The session TZ is pinned to UTC (session.py), so
    # the cast is value-preserving.
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak)
    prev_us = F.lag(ts_us).over(w)
    is_new = (
        prev_us.isNull() | ((ts_us - prev_us) > gap_seconds * 1_000_000)
    ).cast("int")
    run = Window.partitionBy(user_col).orderBy(ts_col, tiebreak).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return events.withColumn(
        "session_seq", F.sum(is_new).over(run).cast("long")
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """One row per (user, session): event count + span in microseconds
    (exact integer arithmetic — no float time math)."""
    tagged = with_session_seq(events, user_col, ts_col, tiebreak, gap_seconds)
    ts_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    return tagged.groupBy(user_col, "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max(ts_us) - F.min(ts_us)).alias("span_us"),
    )
