"""Stateful streaming sessionization via ``applyInPandasWithState``.

The batch twin (`events_sessionize` in plans/analytics.py) assigns session
ids with a lag-window over the full history. A continuous pipeline cannot
window over everything it will ever see, so this is the canonical custom
stateful operator: per-user state (current session id, last-seen time,
event count) lives in the state store, events extend or rotate the session
by the gap rule, and idle users are evicted by timeout — state stays
bounded no matter how long the stream runs.

Scale notes: state is partitioned by user_id (the groupBy key), so a
1000-executor cluster shards the store horizontally; each micro-batch
touches only the users present in the batch; the event-time timeout is the
same bound the batch job expresses with its session-gap predicate.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_GAP_S = 30 * 60

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", IntegerType()),
        StructField("ts", TimestampType()),
        StructField("event_in_session", IntegerType()),
    ]
)

# (session_seq, last_seen_epoch_s, events_in_session)
STATE_SCHEMA = StructType(
    [
        StructField("session_seq", IntegerType()),
        StructField("last_seen", LongType()),
        StructField("n_events", IntegerType()),
    ]
)


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        session_seq, last_seen, n_events = state.get
    else:
        session_seq, last_seen, n_events = 0, None, 0

    out_user, out_seq, out_ts, out_n = [], [], [], []
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        for ts in pdf["ts"]:
            epoch = int(ts.timestamp())
            if last_seen is None or epoch - last_seen > SESSION_GAP_S:
                session_seq += 1
                n_events = 0
            n_events += 1
            last_seen = epoch
            out_user.append(user_id)
            out_seq.append(session_seq)
            out_ts.append(ts)
            out_n.append(n_events)

    state.update((session_seq, last_seen, n_events))
    state.setTimeoutTimestamp((last_seen + SESSION_GAP_S) * 1000)
    yield pd.DataFrame(
        {
            "user_id": out_user,
            "session_seq": out_seq,
            "ts": out_ts,
            "event_in_session": out_n,
        }
    )


def sessionize_stream(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """events(user_id, ts, ...) stream → per-event session assignment.

    Event-time timeout evicts a user's state one gap past their last event;
    the watermark bounds how late input may arrive before its user's state
    may already be gone (same trade the reference makes with its
    ``last_seen`` scan cursor, main.py:33-139).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
