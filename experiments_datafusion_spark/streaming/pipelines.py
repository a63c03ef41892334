"""Event-time pipelines, written once and applied to BOTH batch DataFrames
and Structured Streaming DataFrames (SURVEY.md §2B Streaming row: the
reference's dependency has stream-shaped execution only — Vec<RecordBatch>
streams mirrored at /root/reference/src/data.rs:245-261 — while real
event-time semantics (watermarks, session windows) come from Spark).

Batch callers get the oracle-checkable versions (queries/events.py);
streaming callers (tests/test_streaming.py) run the same functions behind
``readStream`` with ``withWatermark`` for state cleanup at scale.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def with_watermark(df: DataFrame, delay: str = "30 minutes") -> DataFrame:
    """Late-data bound; on a stream this bounds window state size (critical
    at 100 TB — without it session/window state grows unboundedly)."""
    return df.withWatermark("ts", delay) if df.isStreaming else df


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """Tumbling event-time windows: count + value sum per window x type."""
    return (
        with_watermark(events)
        .groupBy(F.window("ts", duration).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, duration: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding (hopping) windows — each event lands in duration/slide
    windows."""
    return (
        with_watermark(events)
        .groupBy(F.window("ts", duration, slide).alias("win"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
        )
    )


def sessionize(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: a session closes after `gap` of silence.
    Works identically on batch and streams (dynamic-gap session_window)."""
    return (
        with_watermark(events)
        .groupBy(F.session_window("ts", gap).alias("sess"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("sess.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format(F.col("sess.end"), "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_events(events: DataFrame) -> DataFrame:
    """Exactly-once by event_id; on a stream, the watermark bounds the
    dedup state (dropDuplicatesWithinWatermark)."""
    if events.isStreaming:
        return events.withWatermark("ts", "30 minutes").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])
