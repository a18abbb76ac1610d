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
    session_idx, n_events, session_start, session_end, duration_us).
    ``user_id`` keeps the caller's dtype — sessions are always computed
    per RAW id, so string ids ('alice', '007') each get their own
    timeline (a lossy cast here would merge every non-numeric id into
    one NULL partition and fuse unrelated users' sessions)."""
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
                 .alias("duration_us")))


SESSION_OUT_DDL = ("user_id long, session_start timestamp, "
                   "session_end timestamp, n_events long, duration_us long")
_SESSION_STATE_DDL = "start_us long, last_us long, n long"


def streaming_sessionize(events_stream: DataFrame,
                         gap_minutes: int = 30,
                         watermark: str = "1 hour",
                         idle_flush: bool = False) -> DataFrame:
    """Stateful streaming sessionization via ``applyInPandasWithState``
    (the custom-stateful-operator pattern): per-user state holds the
    open session (start, last event, count); a batch of events extends
    or closes sessions (gap exceeded → emit the closed session, start a
    new one). Event-time processing with a watermark bounds state and
    late data; state for idle users expires via the processing-time
    timeout and flushes the open session.

    Batch equivalence: emitted rows are exactly ``sessionize``'s closed
    sessions; with ``idle_flush`` open tails also emit after 1 h of
    processing-time inactivity (only for continuous 24/7 queries — a
    pending timeout keeps Trigger.AvailableNow from terminating).
    Unlike the batch operator, the fixed state/output DDL pins
    ``user_id`` to long — this streaming entry point requires numeric
    user ids (the events-table schema); non-numeric ids need a caller
    -side stable mapping first.
    Per-user state is O(1) — no buffering of events, so power-user skew
    cannot blow memory."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key: tuple, pdfs, state: GroupState):
        user_id = int(key[0])

        def row(start_us: int, last_us: int, n: int) -> dict:
            return {"user_id": user_id,
                    "session_start": pd.Timestamp(start_us, unit="us"),
                    "session_end": pd.Timestamp(last_us, unit="us"),
                    "n_events": n, "duration_us": last_us - start_us}

        out = []
        if state.hasTimedOut:
            if state.exists:
                start_us, last_us, n = state.get
                out.append(row(start_us, last_us, n))
                state.remove()
            yield pd.DataFrame(out)
            return
        ts = pd.concat([pdf["ts"] for pdf in pdfs]).sort_values()
        # datetime64[ns] → microseconds
        micros = (ts.astype("int64") // 1000 if ts.dtype.kind == "M"
                  else ts.astype("int64"))
        start_us = last_us = None
        n = 0
        if state.exists:
            start_us, last_us, n = state.get
        for t in (int(x) for x in pd.Series(micros)):
            if last_us is None:
                start_us, last_us, n = t, t, 1
            elif t - last_us > gap_us:
                out.append(row(start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                # a late-but-within-watermark event from a later
                # micro-batch may precede state: the window only ever
                # EXTENDS (batch equivalence — min start, max end)
                start_us = min(start_us, t)
                last_us = max(last_us, t)
                n += 1
        state.update((start_us, last_us, n))
        if idle_flush:
            state.setTimeoutDuration(60 * 60 * 1000)  # 1h processing-time
        yield pd.DataFrame(out)

    timeout = (GroupStateTimeout.ProcessingTimeTimeout if idle_flush
               else GroupStateTimeout.NoTimeout)
    # rows outside the numeric-id / non-null-ts contract are DROPPED
    # before grouping: a NULL key would reach fn as key=(None,) and
    # kill the whole streaming query on int(None); try_cast keeps a
    # non-numeric id from throwing mid-stream under ANSI; a NaT ts
    # would int64-cast to year-1677 garbage and poison the open
    # session's start forever
    return (_with_ts(events_stream)
            .withWatermark("ts", watermark)
            .withColumn("user_id", F.col("user_id").try_cast("long"))
            .filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
            .groupBy("user_id")
            .applyInPandasWithState(
                fn, SESSION_OUT_DDL, _SESSION_STATE_DDL, "append", timeout))


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
