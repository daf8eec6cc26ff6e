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


def _as_event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """``withWatermark`` requires TimestampType; a TIMESTAMP_NTZ source
    column (parquet timestamp[us] with no timezone under Spark 4) is
    cast in place.  Session TZ is pinned to UTC, so the cast is
    value-preserving."""
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def stream_dedup(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact deduplication — the continuous-ingest face of
    the batch ``exact_duplicates`` operator (a training pipeline
    dedups the firehose BEFORE it lands, not only the lake after).

    ``dropDuplicatesWithinWatermark`` keys the state store on ``keys``
    and expires each entry once the watermark passes it, so state is
    bounded by (key cardinality within the watermark horizon), not by
    stream history — the property that makes this runnable forever at
    ingest scale. Duplicates separated by more than the watermark can
    re-emit (documented at-least-once-per-horizon semantics); widen
    the watermark or run the batch dedup downstream for exactness
    across horizons."""
    ev = _as_event_time(events, ts_col)
    return ev.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """(user_id, session_start, session_end, n_events) per dynamic
    session window (events within ``gap`` of each other merge) — the
    STREAMING face of the batch q_sessionization query:
    ``F.session_window`` keeps per-key open-session state on the
    executors and the watermark closes sessions whose gap has passed,
    so state stays bounded at any scale (no driver involvement)."""
    return (
        _as_event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    slide: str | None = None,
) -> DataFrame:
    """(window_start, window_end, event_type, n, total_value) per
    event-time window — tumbling by default, SLIDING when ``slide`` <
    ``window`` is given (each event lands in window/slide overlapping
    windows; Spark expands the assignment inline, so state grows by
    that same factor and the watermark still bounds it)."""
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return (
        _as_event_time(events, ts_col).withWatermark(ts_col, watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "total_value",
        )
    )
