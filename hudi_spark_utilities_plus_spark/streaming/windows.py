"""Event-time windowed aggregation with watermarks (C6 extension).

The reference is processing-time-only (no ``withWatermark`` or window
aggregation anywhere in it — SURVEY §2.C); these are the rebuild's
extensions for the ``events`` stream fixture, built directly on
Structured Streaming's native stateful operators. State is pruned by the
watermark, so the operators run indefinitely at bounded memory —
the 100 TB streaming posture.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling event-time windows; late rows beyond the watermark drop."""
    keys = keys or ["event_type"]
    aggs = aggs or [F.count("*").alias("n")]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_size).alias("w"), *keys)
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .drop("w")
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Sliding windows — each event lands in size/slide windows."""
    keys = keys or ["event_type"]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_size, slide).alias("w"), *keys)
        .agg(F.count("*").alias("n"))
        .withColumn("window_start", F.col("w.start"))
        .drop("w")
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    keys: list[str] | None = None,
) -> DataFrame:
    """Session windows: events within ``gap`` of each other merge."""
    keys = keys or ["user_id"]
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), *keys)
        .agg(F.count("*").alias("n"))
        .withColumn("session_start", F.col("w.start"))
        .withColumn("session_end", F.col("w.end"))
        .drop("w")
    )


def deduped_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once-per-key emission over an at-least-once stream
    (``dropDuplicatesWithinWatermark``): the first arrival of each key
    passes through, replays and redeliveries within the watermark
    horizon are swallowed, and key state is pruned once the watermark
    passes — bounded memory on an unbounded stream.

    This is the ingest-side guard a CDC/event pipeline needs in front
    of the lake writer: upstream buses redeliver on rebalance, and an
    append-mode sink would otherwise double-write. Keys default to
    ``event_id``.
    """
    keys = keys or ["event_id"]
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
