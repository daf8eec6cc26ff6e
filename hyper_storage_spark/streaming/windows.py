"""Streaming windowed aggregation with late-data handling.

The reference has no stream-query surface (its "streaming" is CDC
publication; SURVEY.md §2.4) — this is extension surface: event-time
tumbling windows with a watermark bound on lateness, the Structured
Streaming analog of the batch ``q_distinct_users_daily`` /
``q_sessionization`` queries. The same pipeline runs against Kafka by
swapping the source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """(window_start, window_end, event_type, n, total_value) per
    tumbling event-time window; state for windows older than the
    watermark is dropped (bounded state at any scale)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
