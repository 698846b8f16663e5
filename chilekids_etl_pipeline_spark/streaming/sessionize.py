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

Perf notes (guide §4.2): the group handler is fully vectorized — session
boundaries, sequence numbers and in-session positions are numpy
cumulative-array computations over the whole batch slice, not a Python
loop per event (r8 adjudicated the replay wall as "micro-batch machinery
+ Python state handler"; this removes the handler half). ``emit="sessions"``
additionally applies guide §2.3 (aggregate before you shuffle): the
handler emits one partial (n_events, start, end) row per session touched
by the batch instead of one row per event, so the Python→JVM boundary and
the sink carry session-count rows, not event-count rows; a downstream
sum/min/max merge over partials reconstructs the exact per-session
snapshot even when a session spans micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
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

# one row per (user, session) touched by the batch: additive partials
PARTIAL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_seq", IntegerType()),
        StructField("n_events", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
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


def _epoch_seconds(ts: pd.Series) -> np.ndarray:
    """int(Timestamp.timestamp()) for a whole sorted series at once."""
    vals = ts.to_numpy()
    if vals.dtype.kind != "M":  # tz-aware / object → naive UTC first
        vals = pd.to_datetime(ts, utc=True).dt.tz_localize(None).to_numpy()
    return vals.astype("datetime64[s]").astype("int64")


def _session_arrays(
    epochs: np.ndarray,
    session_seq: int,
    last_seen: int | None,
    n_events: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(is_new, seq, event_in_session) for one sorted epoch array, carrying
    the state triple in: identical arithmetic to the old per-row loop."""
    n = len(epochs)
    prev = np.empty(n, dtype="int64")
    prev[1:] = epochs[:-1]
    is_new = np.empty(n, dtype=bool)
    if last_seen is None:
        is_new[0] = True
    else:
        prev[0] = last_seen
        is_new[0] = epochs[0] - last_seen > SESSION_GAP_S
    is_new[1:] = (epochs[1:] - prev[1:]) > SESSION_GAP_S
    seq = session_seq + np.cumsum(is_new)
    idx = np.arange(n)
    last_start = np.maximum.accumulate(np.where(is_new, idx, -1))
    ev = np.where(last_start >= 0, idx - last_start + 1, idx + 1 + n_events)
    return is_new, seq, ev


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

    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts = pdf["ts"].sort_values(ignore_index=True)
        epochs = _epoch_seconds(ts)
        _, seq, ev = _session_arrays(epochs, session_seq, last_seen, n_events)
        session_seq = int(seq[-1])
        last_seen = int(epochs[-1])
        n_events = int(ev[-1])
        yield pd.DataFrame(
            {
                "user_id": np.full(len(epochs), user_id, dtype="int64"),
                "session_seq": seq,
                "ts": ts,
                "event_in_session": ev,
            }
        )

    state.update((session_seq, last_seen, n_events))
    state.setTimeoutTimestamp((last_seen + SESSION_GAP_S) * 1000)


def _sessionize_partials_group(
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

    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts = pdf["ts"].sort_values(ignore_index=True)
        epochs = _epoch_seconds(ts)
        is_new, seq, ev = _session_arrays(
            epochs, session_seq, last_seen, n_events
        )
        # batch-local slices per session: additive under the downstream
        # sum(n)/min(start)/max(end) merge because counts are
        # batch-local and extents are min/max-mergeable
        bounds = np.flatnonzero(is_new)
        if len(bounds) == 0 or bounds[0] != 0:
            bounds = np.concatenate(([0], bounds))
        counts = np.diff(np.append(bounds, len(epochs)))
        session_seq = int(seq[-1])
        last_seen = int(epochs[-1])
        n_events = int(ev[-1])
        yield pd.DataFrame(
            {
                "user_id": np.full(len(bounds), user_id, dtype="int64"),
                "session_seq": seq[bounds],
                "n_events": counts.astype("int64"),
                "session_start": ts.iloc[bounds].reset_index(drop=True),
                "session_end": ts.iloc[bounds + counts - 1].reset_index(
                    drop=True
                ),
            }
        )

    state.update((session_seq, last_seen, n_events))
    state.setTimeoutTimestamp((last_seen + SESSION_GAP_S) * 1000)


def sessionize_stream(
    events: DataFrame, watermark: str = "1 hour", emit: str = "events"
) -> DataFrame:
    """events(user_id, ts, ...) stream → session assignment.

    ``emit="events"``: one row per event (user_id, session_seq, ts,
    event_in_session) — the per-event assignment the equivalence tests
    check. ``emit="sessions"``: one additive partial row per (user,
    session) per micro-batch (user_id, session_seq, n_events,
    session_start, session_end); consumers merge partials with
    sum/min/max keyed on (user_id, session_seq). Same state machine,
    same state schema, same eviction.

    Event-time timeout evicts a user's state one gap past their last event;
    the watermark bounds how late input may arrive before its user's state
    may already be gone (same trade the reference makes with its
    ``last_seen`` scan cursor, main.py:33-139).
    """
    fn, schema = {
        "events": (_sessionize_group, OUTPUT_SCHEMA),
        "sessions": (_sessionize_partials_group, PARTIAL_SCHEMA),
    }[emit]
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=schema,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
