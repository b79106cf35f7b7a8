"""Tumbling / sliding / session windows over the events table.

Batch forms use the same ``window()`` / ``session_window()``
expressions Structured Streaming executes incrementally — the logical
plan is identical, so correctness checked in batch (against the
DuckDB oracle) carries to the streaming wrapper, which only adds a
watermark and an incremental sink. (Absent in the reference — the
capability-gap table SURVEY.md §2.10 requires it.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _win_cols():
    return [
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
    ]


def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Per-window, per-event-type counts and value sums."""
    return (
        events.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(*_win_cols(), "event_type", "n_events", "sum_value")
    )


def sliding_user_activity(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding-window distinct-user counts (each event lands in
    width/slide windows)."""
    return (
        events.groupBy(F.window("ts", width, slide))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(*_win_cols(), "n_users", "n_events")
    )


def session_windows(events: DataFrame, gap: str = "15 minutes") -> DataFrame:
    """Per-user sessions: a session closes after ``gap`` of
    inactivity; window end = last event + gap (Spark semantics)."""
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_tumbling_counts(
    spark,
    source_dir: str,
    schema: str,
    width: str = "1 hour",
    watermark: str = "2 hours",
):
    """Structured Streaming wrapper: file source → watermarked tumbling
    aggregation. Returns the (unstarted) streaming DataFrame; callers
    attach a sink (``writeStream``) and a trigger.

    Late data beyond ``watermark`` is dropped; state for closed
    windows is evicted — the standard production pattern for
    event-stream rollups.
    """
    # Watermarks are only defined on instant (TIMESTAMP) event time —
    # NTZ sources are interpreted in the session timezone.
    stream = (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    return (
        stream.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(*_win_cols(), "event_type", "n_events", "sum_value")
    )
