"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (task mandate: "applyInPandasWithState for
custom stateful operators").

Semantics: events per ``user_id`` are grouped into sessions separated
by gaps > ``gap`` seconds of event time. A session is emitted when the
watermark passes its close (timeout), carrying (user_id, session_start,
session_end, n_events, total_value).

State per key: (session_start_epoch, last_ts_epoch, n_events,
total_value) — four scalars, so state size is O(active users), not
O(events): the property that keeps it alive at fire-hose scale.

The same function doubles as a batch sessionizer through
``sessionize_batch`` (window/lag implementation) — used as the oracle
twin in tests.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start long, last long, n long, total double"

_US = 1_000_000


def _sessionize_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        sessions = []
        if state.hasTimedOut:
            start, last, n, total = state.get
            sessions.append((user_id, start, last, n, total))
            state.remove()
        else:
            rows = []
            for pdf in pdfs:
                for ts, value in zip(pdf["ts"], pdf["value"]):
                    rows.append((int(ts.value // 1000), float(value)))  # ns → us
            rows.sort()
            if state.exists:
                start, last, n, total = state.get
            else:
                start, last, n, total = None, None, 0, 0.0
            for ts_us, value in rows:
                if last is not None and ts_us - last > gap_us:
                    sessions.append((user_id, start, last, n, total))
                    start, last, n, total = ts_us, ts_us, 1, value
                else:
                    # A late (within-watermark, out-of-order across
                    # micro-batches) event merges into the open session:
                    # the bounds only ever WIDEN. Writing `last = ts_us`
                    # unconditionally would move `last` backward, causing
                    # false gap splits and an early timeout.
                    if start is None:
                        start, last = ts_us, ts_us
                    else:
                        start = min(start, ts_us)
                        last = max(last, ts_us)
                    n += 1
                    total += value
            if start is not None:
                state.update((start, last, n, total))
                state.setTimeoutTimestamp(last // 1000 + gap_seconds * 1000)
        if sessions:
            yield pd.DataFrame(
                {
                    "user_id": [s[0] for s in sessions],
                    "session_start": [
                        dt.datetime.utcfromtimestamp(s[1] / _US) for s in sessions
                    ],
                    "session_end": [
                        dt.datetime.utcfromtimestamp(s[2] / _US) for s in sessions
                    ],
                    "n_events": [s[3] for s in sessions],
                    "total_value": [round(s[4], 6) for s in sessions],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame, gap_seconds: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming DataFrame of events(ts, user_id, value) → closed
    sessions (emitted when event time moves ``gap`` past their end)."""
    src = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    return src.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch twin (oracle): lag + cumulative session ids + groupBy.
    Includes the final (unclosed) session of every user — callers
    comparing against the streaming output must drop each user's last
    session (the stream keeps it open until the watermark passes)."""
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_flag = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
        > gap_seconds
    ).cast("int")
    sessions = events.withColumn(
        "session_no", F.sum(F.coalesce(gap_flag, F.lit(0))).over(w)
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("total_value"),
    ).drop("session_no")
