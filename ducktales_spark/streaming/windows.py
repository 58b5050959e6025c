"""Streaming window aggregations + custom stateful operators.

Works over the driver's ``events`` table shape (ts, user_id, event_type,
value, props) — the natural substrate SURVEY.md §2.11 names for tumbling
windows. Both functions accept a batch OR streaming DataFrame: the same
declarative plan runs under Structured Streaming's incremental execution
(watermark bounds state) or as a batch query (the driver's oracle checks the
batch twin — x02_tumbling_hourly etc.).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Tumbling (or sliding, if ``slide`` given) window counts + value sums
    per event_type. Under streaming, the watermark lets Spark drop state for
    closed windows and handle late data up to the watermark horizon."""
    if events.isStreaming:
        events = events.withWatermark("ts", watermark)
    win = (
        F.window("ts", window)
        if slide is None
        else F.window("ts", window, slide)
    )
    return events.groupBy(win.alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        "event_type",
        "n_events",
        "sum_value",
    )


_SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events int"
)
_STATE_SCHEMA = "start long, last long, n int"


def _make_session_fn(gap_minutes: int, timeout_ms: int | None):
    gap_us = gap_minutes * 60 * 1_000_000

    def _session_fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        """Per-user sessionizer: events within ``gap`` share a session; a gap
        in event time (or, if configured, a processing-time timeout) closes
        it. State is three longs — microsecond timestamps + count."""
        (user_id,) = key

        def emit(rows):
            return pd.DataFrame(
                {
                    "user_id": pd.array([r[0] for r in rows], dtype="int64"),
                    "session_start": pd.to_datetime(
                        [r[1] for r in rows], unit="us"
                    ),
                    "session_end": pd.to_datetime(
                        [r[2] for r in rows], unit="us"
                    ),
                    "n_events": pd.array([r[3] for r in rows], dtype="int32"),
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit([(user_id, start, last, n)])
            return
        ts_us: list = []
        for pdf in pdfs:
            ts_us.extend((pdf["ts"].astype("int64") // 1000).tolist())
        ts_us.sort()
        out = []
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts_us[0], ts_us[0], 0
        for t in ts_us:
            if t - last > gap_us:  # close current session, open a new one
                out.append((user_id, start, last, n))
                start, n = t, 0
            last = t
            n += 1
        state.update((int(start), int(last), int(n)))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        yield emit(out)

    return _session_fn


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): per-user
    session windows with a ``gap_minutes`` inactivity gap. Arrow-batched
    state updates; state size is O(active users). Input needs (user_id, ts).

    With ``timeout_ms`` set, idle open sessions are flushed by a
    processing-time timeout (continuous production mode); with None, a
    session emits only when a LATER event proves the gap elapsed — each
    key's final still-open session deliberately stays in state (it is not
    finished; emitting it early would be wrong if more events arrive). For
    complete sessionization of bounded data use the batch twin
    (queries/windows.py x06), which sees the end of input."""
    return (
        events.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_minutes, timeout_ms),
            outputStructType=_SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if timeout_ms is not None
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
