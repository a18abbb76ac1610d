"""Event-stream analytics operators over the timestamped events table:
tumbling-window rollups and gap-based sessionization. Not part of the
reference's surface (it is strictly batch NLP) — these are the
time-series operations a corpus-ingest pipeline needs for telemetry /
arrival-rate monitoring, expressed so they run identically in batch and
Structured Streaming (the rollup groups by a time window; streaming
callers add ``withWatermark`` for late-data bounds).

Scale notes: both are single-shuffle aggregations keyed by
(window/user), with map-side partial aggregation; sessionization's
window function partitions by user_id — skewed power-users are bounded
because per-user state is a running lag/cumsum, not a buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _with_ts(events: DataFrame) -> DataFrame:
    # parquet scans give TIMESTAMP_NTZ; unix_micros needs TIMESTAMP
    # (session tz is pinned to UTC so the instant is unchanged)
    return events.withColumn("ts", F.col("ts").cast("timestamp"))


def daily_rollup(events: DataFrame) -> DataFrame:
    """Per-day, per-type rollup: (day, event_type, n_events, value_cents,
    min_value, max_value). Money-ish doubles are summed as exact integer
    cents so results are order-insensitive and cross-engine stable."""
    return (_with_ts(events)
            .groupBy(F.date_trunc("day", "ts").alias("day"),
                     "event_type")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.sum(F.round(F.col("value") * 100).cast("long"))
                  .alias("value_cents"),
                 F.min("value").alias("min_value"),
                 F.max("value").alias("max_value")))


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap to
    the previous event exceeds ``gap_minutes``. Returns (user_id,
    session_idx, n_events, session_start, session_end, duration_us)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.unix_micros("ts")).over(w)
    new_session = F.when(
        prev.isNull() | ((F.unix_micros("ts") - prev) > gap_us), 1
    ).otherwise(0)
    sess = (_with_ts(events)
            .withColumn("new_sess", new_session)
            .withColumn("session_idx",
                        F.sum("new_sess").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))
                        .cast("long")))
    return (sess.groupBy("user_id", "session_idx")
            .agg(F.count("*").cast("long").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts")))
                 .alias("duration_us"))
            .withColumn("user_id", F.col("user_id").cast("long")))


def streaming_rollup(events_stream: DataFrame,
                     watermark: str = "1 day",
                     window: str = "1 day") -> DataFrame:
    """Watermarked tumbling-window counts for the streaming path: late
    events beyond ``watermark`` are dropped, windows finalize (and emit
    in append mode) once the watermark passes their end."""
    return (_with_ts(events_stream)
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("win"), "event_type")
            .agg(F.count("*").cast("long").alias("n_events"))
            .select(F.col("win.start").alias("window_start"),
                    "event_type", "n_events"))
