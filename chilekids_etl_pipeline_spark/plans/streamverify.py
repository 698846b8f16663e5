"""Batch-verifiable streaming entry: the stateful sessionizer run through
the REAL Structured Streaming engine (file source → applyInPandasWithState
→ memory sink, availableNow bounded replay), snapshotted into a per-session
summary the DuckDB oracle can check with plain window SQL.

Until this entry the streaming surface was tests-only; the gate now
exercises the state-store path end-to-end every round. The session
semantics are definitionally those of the batch twin
(plans/analytics.py events_sessionize, reference gas/last_change.gs "gap
rule"): a 30-minute inactivity gap rotates the session, so the per-session
(n_events, start, end) snapshot after a full bounded replay must equal the
batch window computation — which is exactly what the oracle states.

Scale notes: the replay is one availableNow pass over the event files —
at 100 TB this is the standard backfill-through-the-streaming-topology
pattern (same code path as live ingest, bounded trigger), with state
sharded by user_id across executors and evicted by event-time timeout.
The memory sink is verification-only; production writes through
streaming/incremental.py's upsert sinks.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import register

_SNAPSHOT_ORACLE = """
WITH gaps AS (
    SELECT user_id, ts,
           CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) <= 1800
                THEN 0 ELSE 1 END AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, ts,
           sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS session_seq
    FROM gaps
)
SELECT user_id, cast(session_seq AS int) AS session_seq,
       cast(count(*) AS bigint) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end
FROM sessions
GROUP BY user_id, session_seq
"""


@register("streaming_sessionize_replay", oracle=_SNAPSHOT_ORACLE)
def streaming_sessionize_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded replay of the events table through the streaming
    sessionizer (streaming/sessionize.py), returning the per-session
    snapshot. The stream is a real file-source readStream with an
    availableNow trigger into a memory sink; the returned DataFrame
    aggregates the emitted per-event session assignments. Session
    numbering (1-based per user), the 30-min gap rule, and per-session
    event counts/extents must — and do — match the batch lag-window
    oracle, because a session is a pure function of each user's ordered
    timestamps regardless of which engine walks them."""
    from ..streaming.sessionize import sessionize_stream

    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file stream source lists a DIRECTORY (its discovery unit on a
    # real deployment — new files land, the source picks them up);
    # expose the single test file through a temp dir of symlinks
    src_dir = tempfile.mkdtemp(prefix="ssr_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(src_dir, "events.parquet"),
    )
    raw = (
        spark.readStream.schema(batch_schema)
        .parquet(src_dir)
        .select("user_id", "ts", "event_id")
    )
    # TIMESTAMP(NANOS) parquet reads as long under the session's
    # nanosAsLong conf (see sources/tables.py) — truncate to micros
    if dict(raw.dtypes)["ts"] == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    sessions = sessionize_stream(raw, watermark="1 hour")

    name = "streaming_sessionize_replay_sink"
    try:
        spark.catalog.dropTempView(name)
    except Exception:
        pass
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ssr_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(name)
    return emitted.groupBy(
        "user_id", F.col("session_seq").cast("int").alias("session_seq")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )
