"""Structured Streaming surface over the events table shape.

The reference has no streaming (SURVEY §2.11); this module adds the
Spark-native streaming layer a transcript/event feed needs at scale:
watermarked windowed aggregation and incremental (streaming) edge
extraction. Every transformation is defined once and applied identically to
batch and streaming DataFrames — the functions take either.

events(event_id long, ts timestamp, user_id long, event_type string,
       value double, props string)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Per event-type tumbling/sliding window counts + value stats.

    On a stream: late rows beyond `watermark` are dropped and window state
    is evicted — bounded state at any input rate. Identical code path works
    on a batch DataFrame (watermark is a no-op there).
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    win = F.window("ts", window, slide) if slide else F.window("ts", window)
    return src.groupBy(win.alias("win"), "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        F.approx_count_distinct("user_id").alias("approx_users"),
    ).select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
        "approx_users",
    )


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (stateful streaming op via session_window)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return src.groupBy(
        F.session_window("ts", gap).alias("sess"), "user_id"
    ).agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value")).select(
        F.col("sess.start").alias("session_start"),
        F.col("sess.end").alias("session_end"),
        "user_id",
        "n_events",
        "sum_value",
    )


def streaming_transcript_edges(transcripts: DataFrame, params=None) -> DataFrame:
    """Incremental edge extraction: the SAME parse+edge pipeline applied to a
    transcript stream (mapInPandas and the expression cascade are both
    streaming-compatible; the per-conv kernels then run as periodic batch
    jobs over the accumulated edge table — the lambda-free pattern)."""
    from ..operators.edges import edges_table, multi_edges_table
    from ..parse import parse_transcripts

    parsed = parse_transcripts(transcripts)
    return edges_table(multi_edges_table(parsed, params=params))
