"""Streaming pipelines: incremental ELT (file source → hash-dedup →
normalize → memory sink) and stateful sessionization
(applyInPandasWithState), both run with availableNow triggers on real
event data dropped as JSON files."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from chilekids_etl_pipeline_spark.sources.tables import load_table
from chilekids_etl_pipeline_spark.streaming.incremental import (
    incremental_normalize,
    read_event_stream,
    start_to_memory,
)
from chilekids_etl_pipeline_spark.streaming.sessionize import sessionize_stream
from tests.conftest import SF_SMALL


@pytest.fixture()
def event_drops(spark, tmp_path):
    """events at sf0.001 split into 3 JSON file drops (micro-batches)."""
    ev = (
        load_table(spark, SF_SMALL, "events")
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .limit(300)
        .toPandas()
    )
    for i in range(3):
        chunk = ev.iloc[i * 100 : (i + 1) * 100]
        with open(tmp_path / f"drop_{i}.json", "w") as f:
            for _, r in chunk.iterrows():
                f.write(
                    json.dumps(
                        {
                            "event_id": int(r.event_id),
                            "ts": r.ts.isoformat(),
                            "user_id": int(r.user_id),
                            "event_type": r.event_type,
                            "value": float(r.value),
                            "props": r.props,
                        }
                    )
                    + "\n"
                )
    return str(tmp_path), ev


def test_incremental_stream_dedups_and_normalizes(spark, event_drops):
    path, ev = event_drops
    stream = read_event_stream(spark, path, max_files_per_trigger=1)
    q = start_to_memory(incremental_normalize(stream), "t_staging_stream")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM t_staging_stream").toPandas()
    assert set(out.columns) == {
        "raw_id", "received_at", "source_type", "event_type", "amount", "payload_hash",
    }
    # every distinct content hash appears exactly once (streaming dedup)
    assert out["payload_hash"].is_unique
    assert 0 < len(out) <= 300
    assert (out["source_type"] == "live").all()


def test_sessionize_stream_matches_batch_gap_rule(spark, event_drops):
    path, ev = event_drops
    stream = read_event_stream(spark, path, max_files_per_trigger=3)
    q = start_to_memory(sessionize_stream(stream), "t_sessions_stream")
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM t_sessions_stream").toPandas()
    assert len(out) == 300  # one output row per input event

    # batch reference: same 30-min gap rule via a lag window
    batch = (
        spark.createDataFrame(ev[["user_id", "ts"]])
        .withColumn(
            "new_sess",
            F.coalesce(
                (
                    F.col("ts").cast("long")
                    - F.lag("ts").over(
                        Window.partitionBy("user_id").orderBy("ts")
                    ).cast("long")
                )
                > 1800,
                F.lit(True),
            ).cast("int"),
        )
        .withColumn(
            "session_seq",
            F.sum("new_sess").over(Window.partitionBy("user_id").orderBy("ts")),
        )
        .toPandas()
    )
    merged = out.merge(
        batch[["user_id", "ts", "session_seq"]],
        on=["user_id", "ts"],
        suffixes=("_stream", "_batch"),
    )
    assert len(merged) == 300
    assert (merged["session_seq_stream"] == merged["session_seq_batch"]).all()


def test_streaming_tumbling_window_matches_batch(spark, event_drops):
    path, ev = event_drops
    stream = read_event_stream(spark, path, max_files_per_trigger=1)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_windows_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r.window_start: r.n
        for r in spark.sql("SELECT * FROM t_windows_stream").collect()
    }
    batch = (
        spark.createDataFrame(ev[["ts"]])
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    want = {r.window_start: r.n for r in batch}
    assert got == want


def test_watermark_drops_late_events_in_append_mode(spark, tmp_path):
    """Late-data semantics: an event arriving after the watermark has
    passed its window must be dropped from the append-mode windowed
    aggregate. Two availableNow runs share a checkpoint, so the second run
    restores the first run's watermark — the restart-safe bounded-state
    behavior a batch recompute (which would count the late event) lacks."""
    import json as _json

    data = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    import os

    os.makedirs(data)
    base = "2024-01-01T"

    def drop(name, rows):
        with open(f"{data}/{name}", "w") as f:
            for ts, eid in rows:
                f.write(
                    _json.dumps(
                        {"event_id": eid, "ts": f"{base}{ts}", "user_id": 1,
                         "event_type": "view", "value": 1.0, "props": "{}"}
                    ) + "\n"
                )

    from chilekids_etl_pipeline_spark.streaming.incremental import read_event_stream

    out = str(tmp_path / "out")

    def run(_query_name):
        stream = read_event_stream(spark, data)
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("window_start"), "n")
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            str(r.window_start): r.n
            for r in spark.read.parquet(out).collect()
        }

    # run 1: two hour-10 events + an hour-12 event -> watermark ends at
    # 11:30, finalizing and emitting the hour-10 window with n=2
    drop("drop_0.json", [("10:05:00", 1), ("10:20:00", 2), ("12:00:00", 3)])
    got1 = run("t_late_w1")
    assert got1.get("2024-01-01 10:00:00") == 2

    # run 2 (same checkpoint -> watermark restored at 11:30): a LATE
    # hour-10 event must be dropped — not merged, not re-emitted — while
    # the hour-14 event advances the watermark and finalizes hour-12
    drop("drop_1.json", [("10:40:00", 4), ("14:00:00", 5)])
    run("t_late_w2")
    rows = [
        (str(r.window_start), r.n) for r in spark.read.parquet(out).collect()
    ]
    # the hour-10 window still reads n=2 from run 1, exactly once: the late
    # 10:40 arrival was dropped — not merged (no n=3) and not re-emitted
    # (no second hour-10 row); hour-12 was finalized by the watermark
    # advancing to 13:30
    assert sorted(n for w, n in rows if w == "2024-01-01 10:00:00") == [2]
    assert sorted(n for w, n in rows if w == "2024-01-01 12:00:00") == [1]


def test_foreachbatch_upsert_sink_restart_and_replay(spark, tmp_path):
    """The streaming twin of staging_upsert: a foreachBatch MERGE into a
    keyed parquet target. Proves (a) last-write-wins within a batch,
    (b) a restarted query (same checkpoint) upserts instead of appending,
    (c) a replayed batch (same batch_id re-delivered after a crash between
    sink write and checkpoint commit) is skipped, not double-applied."""
    import json as _json
    import os

    from chilekids_etl_pipeline_spark.streaming.incremental import (
        incremental_normalize,
        merge_upsert_batch,
        read_event_stream,
        start_upsert_sink,
    )

    data = str(tmp_path / "data")
    ckpt = str(tmp_path / "ckpt")
    target = str(tmp_path / "target")
    os.makedirs(data)

    def drop(name, rows):
        with open(f"{data}/{name}", "w") as f:
            for eid, ts, val in rows:
                f.write(
                    _json.dumps(
                        {"event_id": eid, "ts": f"2024-01-01T{ts}", "user_id": 1,
                         "event_type": "view", "value": val, "props": "{}"}
                    ) + "\n"
                )

    def run():
        stream = read_event_stream(spark, data, max_files_per_trigger=1)
        q = start_upsert_sink(incremental_normalize(stream), target, ckpt)
        q.awaitTermination(120)

    # run 1: key 1 appears twice (later ts must win), key 2 once
    drop("drop_0.json", [(1, "10:00:00", 10.0), (1, "11:00:00", 11.0), (2, "10:30:00", 20.0)])
    run()
    got = {r.raw_id: float(r.amount) for r in spark.read.parquet(target).collect()}
    assert got == {1: 11.0, 2: 20.0}

    # run 2 (restart, same checkpoint): update key 2, insert key 3 —
    # key 1 must survive untouched, key 2 must be REPLACED not duplicated
    drop("drop_1.json", [(2, "12:00:00", 21.0), (3, "12:05:00", 30.0)])
    run()
    rows = spark.read.parquet(target).collect()
    assert len(rows) == 3  # upsert, not append
    got = {r.raw_id: float(r.amount) for r in rows}
    assert got == {1: 11.0, 2: 21.0, 3: 30.0}

    # replay: re-deliver an already-absorbed batch id directly — the merge
    # must detect it in the target and skip (idempotent under the
    # crash-between-write-and-commit window). The replay carries the SAME
    # sink identity (same checkpoint) — that is what the guard keys on.
    from chilekids_etl_pipeline_spark.streaming.incremental import sink_id_for

    applied = spark.read.parquet(target)
    max_bid = applied.agg(F.max("_batch_id")).first()[0]
    replay = applied.filter(F.col("raw_id") == 2).withColumn(
        "amount", F.lit(99.0).cast("decimal(10,2)")
    ).drop("_batch_id", "_sink_id")
    merge_upsert_batch(target, sink_id=sink_id_for(ckpt))(replay, max_bid)
    got = {r.raw_id: float(r.amount) for r in spark.read.parquet(target).collect()}
    assert got[2] == 21.0  # unchanged: replayed batch skipped


def test_upsert_sink_crash_recovery_and_fresh_checkpoint(spark, tmp_path):
    """The upsert sink's two crash windows and the checkpoint-reset case:

    (a) crash BETWEEN the two renames (target gone, .old holds state) —
        the next merge must restore .old and re-merge against it, not
        start from an empty target;
    (b) crash AFTER the swap but before cleanup (stale non-empty .old
        beside a live target) — the next merge must clear it instead of
        failing ENOTEMPTY on its own rename;
    (c) a query restarted with a FRESH checkpoint (batch ids reset to 0)
        against an existing target must still apply — replay detection is
        keyed on (sink_id, batch_id), not batch_id alone — and its rows
        must WIN on key conflict despite the lower batch id."""
    import os
    import shutil

    from chilekids_etl_pipeline_spark.streaming.incremental import (
        merge_upsert_batch,
    )

    target = str(tmp_path / "target")

    def frame(rows):
        return spark.createDataFrame(
            rows, "raw_id long, received_at timestamp, payload_hash string, amount double"
        )

    import datetime as dt

    def row(k, amount, h="h"):
        return (k, dt.datetime(2024, 1, 1, 10), f"{h}{k}", amount)

    merge_a = merge_upsert_batch(target, sink_id="ckpt-a")
    merge_a(frame([row(1, 10.0), row(2, 20.0)]), 0)
    merge_a(frame([row(2, 21.0)]), 1)
    got = {r.raw_id: r.amount for r in spark.read.parquet(target).collect()}
    assert got == {1: 10.0, 2: 21.0}

    # (a) simulate the crash between os.rename(target, old) and
    # os.rename(tmp, target): target missing, .old holds the state
    os.rename(target, target + ".old")
    merge_a(frame([row(3, 30.0)]), 2)
    got = {r.raw_id: r.amount for r in spark.read.parquet(target).collect()}
    assert got == {1: 10.0, 2: 21.0, 3: 30.0}, "pre-crash state was lost"
    assert not os.path.exists(target + ".old")

    # (b) stale non-empty .old beside a live target (crash after swap,
    # before rmtree) — must not wedge the next merge
    shutil.copytree(target, target + ".old")
    merge_a(frame([row(4, 40.0)]), 3)
    got = {r.raw_id: r.amount for r in spark.read.parquet(target).collect()}
    assert got == {1: 10.0, 2: 21.0, 3: 30.0, 4: 40.0}
    assert not os.path.exists(target + ".old")

    # (c) fresh checkpoint: batch id 0 again, new sink identity — must
    # apply (bare-id comparison would skip it: 0 < 3) and must win key 2
    merge_b = merge_upsert_batch(target, sink_id="ckpt-b")
    merge_b(frame([row(2, 99.0)]), 0)
    got = {r.raw_id: r.amount for r in spark.read.parquet(target).collect()}
    assert got == {1: 10.0, 2: 99.0, 3: 30.0, 4: 40.0}

    # and merge_b's OWN replay guard still works at its batch 0
    merge_b(frame([row(2, 77.0)]), 0)
    got = {r.raw_id: r.amount for r in spark.read.parquet(target).collect()}
    assert got[2] == 99.0, "replayed batch 0 of the new sink double-applied"


def test_stream_stream_interval_join_matches_batch(spark, event_drops):
    """The attribution interval join (purchase to preceding views within
    the horizon) as a stream-stream join must produce exactly the rows the
    equivalent batch join produces on the same events."""
    from chilekids_etl_pipeline_spark.streaming.joins import view_to_purchase_stream

    path, ev = event_drops
    stream = read_event_stream(spark, path, max_files_per_trigger=1)
    q = start_to_memory(view_to_purchase_stream(stream), "t_vp_stream")
    q.awaitTermination(120)
    got = {
        (r.view_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM t_vp_stream").collect()
    }

    edf = spark.createDataFrame(ev)
    v = edf.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    p = edf.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = {
        (r.view_id, r.purchase_id)
        for r in v.join(
            p,
            F.expr(
                "user_id = p_user_id AND purchase_ts >= view_ts "
                "AND purchase_ts <= view_ts + INTERVAL 120 MINUTES"
            ),
        ).collect()
    }
    assert len(want) > 0
    assert got == want


def test_streaming_quality_gate_routes_and_audits(spark, tmp_path):
    """The continuous DQ gate: planted bad rows (null id, bad type,
    negative value) land in quarantine tagged with exactly the checks
    they fail; clean rows pass through untouched; the per-batch audit
    reconciles with the routing."""
    import json as _json

    from chilekids_etl_pipeline_spark.streaming.incremental import read_event_stream
    from chilekids_etl_pipeline_spark.streaming.quality_gate import (
        event_expectations,
        start_quality_gate,
    )

    drops = tmp_path / "drops"
    drops.mkdir()
    rows = []
    for i in range(40):
        rows.append(
            {
                "event_id": i,
                "ts": f"2024-01-01T00:{i:02d}:00",
                "user_id": i % 5,
                "event_type": "view",
                "value": float(i),
                "props": "{}",
            }
        )
    # planted violations
    rows[3]["event_id"] = None                     # id missing
    rows[7]["event_type"] = "teleport"             # out of domain
    rows[11]["value"] = -5.0                       # negative value
    rows[13]["event_type"] = "teleport"            # out of domain AND...
    rows[13]["value"] = -1.0                       # ...negative
    with open(drops / "d0.json", "w") as f:
        for r in rows[:20]:
            f.write(_json.dumps(r) + "\n")
    with open(drops / "d1.json", "w") as f:
        for r in rows[20:]:
            f.write(_json.dumps(r) + "\n")

    good_dir = str(tmp_path / "good")
    quar_dir = str(tmp_path / "quarantine")
    audit_dir = str(tmp_path / "audit")
    stream = read_event_stream(spark, str(drops), max_files_per_trigger=1)
    q = start_quality_gate(
        stream,
        event_expectations(),
        good_dir,
        quar_dir,
        audit_dir,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    good = spark.read.parquet(good_dir).toPandas()
    bad = spark.read.parquet(quar_dir).toPandas()
    audit = spark.read.parquet(audit_dir).toPandas()

    assert len(good) + len(bad) == 40
    assert len(bad) == 4
    by_id = {r.event_id: r.failed_checks for r in bad.itertuples()}
    assert by_id[7.0] == "event_type_in_domain"
    assert by_id[11.0] == "value_non_negative"
    assert set(by_id[13.0].split(",")) == {
        "event_type_in_domain",
        "value_non_negative",
    }
    null_row = bad[bad.event_id.isna()]
    assert len(null_row) == 1
    assert null_row.iloc[0].failed_checks == "event_id_present"
    # good rows carry no gate column and none of the planted ids
    assert "failed_checks" not in good.columns
    assert not set(good.event_id) & {7, 11, 13}

    # audit reconciles: per-check violation totals across batches match
    totals = audit.groupby("check_name").n_violations.sum()
    assert totals["event_id_present"] == 1
    assert totals["event_type_in_domain"] == 2
    assert totals["value_non_negative"] == 2
    assert audit.groupby("_batch_id").n_checked.max().sum() == 40


def test_streaming_hll_registers_match_batch(spark, event_drops):
    """The streamed HLL register table must be bit-identical to the
    batch computation over the same events, and the derived estimate
    must land within sketch error of the exact distinct count."""
    from chilekids_etl_pipeline_spark.streaming.sketches import (
        hll_estimate,
        hll_register_updates,
        start_register_stream,
    )

    path, ev = event_drops
    stream = read_event_stream(spark, path, max_files_per_trigger=1)
    q = start_register_stream(stream, "t_hll_registers")
    q.awaitTermination(120)

    streamed = spark.table("t_hll_registers").toPandas()
    batch_events = spark.createDataFrame(ev[["event_type", "user_id"]])
    batch = hll_register_updates(batch_events).toPandas()
    key = ["event_type", "bucket"]
    s = streamed.sort_values(key, ignore_index=True)
    b = batch.sort_values(key, ignore_index=True)
    assert s.equals(b), "streamed registers diverge from batch registers"

    est = hll_estimate(spark.table("t_hll_registers")).toPandas()
    exact = ev.groupby("event_type").user_id.nunique()
    for r in est.itertuples():
        rel = abs(r.hll_estimate - exact[r.event_type]) / exact[r.event_type]
        assert rel < 0.2, (r.event_type, r.hll_estimate, exact[r.event_type])


def test_streaming_cms_cells_match_batch(spark, tmp_path):
    """The streamed Count-Min sketch must be cell-identical to the batch
    computation over the same documents (the cell is a SUM — per-batch
    partials merge losslessly), and probing it for the true top terms
    must never underestimate (the CMS one-sided error guarantee)."""
    from chilekids_etl_pipeline_spark.streaming.sketches import (
        cms_cell_updates,
        cms_probe,
        start_cms_stream,
    )

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .limit(300)
        .toPandas()
    )
    for i in range(3):
        chunk = docs.iloc[i * 100 : (i + 1) * 100]
        with open(tmp_path / f"docs_{i}.json", "w") as f:
            for _, r in chunk.iterrows():
                f.write(
                    json.dumps({"doc_id": int(r.doc_id), "text": r.text})
                    + "\n"
                )

    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path))
    )
    q = start_cms_stream(stream, "t_cms_cells")
    q.awaitTermination(120)

    streamed = spark.table("t_cms_cells").toPandas()
    batch_docs = spark.createDataFrame(docs[["doc_id", "text"]])
    batch = cms_cell_updates(batch_docs).toPandas()
    key = ["i", "b"]
    s = streamed.sort_values(key, ignore_index=True)
    b = batch.sort_values(key, ignore_index=True)
    assert s.equals(b), "streamed CMS cells diverge from batch cells"

    counts = (
        batch_docs.selectExpr("explode(split(text, ' ')) AS term")
        .where("term <> ''")
        .groupBy("term")
        .count()
        .orderBy(F.desc("count"), "term")
        .limit(10)
        .toPandas()
    )
    est = cms_probe(
        spark.table("t_cms_cells"),
        spark.createDataFrame(counts[["term"]]),
    ).toPandas()
    merged = counts.merge(est, on="term")
    assert len(merged) == 10
    assert (merged.cms_estimate >= merged["count"]).all(), merged


def test_streaming_corpus_dedup_matches_batch_anti_join(spark, tmp_path):
    """The stream-static corpus gate must keep exactly the documents the
    batch anti join keeps: drops containing corpus copies lose them,
    novel documents pass."""
    from chilekids_etl_pipeline_spark.streaming.dedup import (
        corpus_signatures,
        dedup_stream_against_corpus,
        start_corpus_dedup_stream,
    )

    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", "text")
        .limit(200)
        .toPandas()
    )
    corpus = docs.iloc[:100]          # existing corpus
    novel = docs.iloc[100:].copy()    # genuinely new docs
    novel["doc_id"] += 1000000
    copies = corpus.iloc[::5].copy()  # re-ingested corpus docs
    copies["doc_id"] += 2000000
    import pandas as pd

    incoming = pd.concat(
        [novel.iloc[:50], copies, novel.iloc[50:]], ignore_index=True
    )
    for i in range(3):
        chunk = incoming.iloc[i * 40 : (i + 1) * 40 + (len(incoming) - 120 if i == 2 else 0)]
        with open(tmp_path / f"in_{i}.json", "w") as f:
            for _, r in chunk.iterrows():
                f.write(
                    json.dumps({"doc_id": int(r.doc_id), "text": r.text})
                    + "\n"
                )

    sigs = corpus_signatures(spark.createDataFrame(corpus))
    stream = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path))
    )
    q = start_corpus_dedup_stream(stream, sigs, "t_novel_docs")
    q.awaitTermination(120)

    streamed = spark.table("t_novel_docs").toPandas()
    batch = dedup_stream_against_corpus(
        spark.createDataFrame(incoming), sigs
    ).toPandas()
    assert sorted(streamed.doc_id) == sorted(batch.doc_id)
    assert set(copies.doc_id).isdisjoint(set(streamed.doc_id))
    assert set(novel.doc_id) <= set(streamed.doc_id)


# ---------------------------------------------------------------------------
# emit="sessions" partials handler, driven directly across micro-batches
# (ADVICE r12 #2: the replay oracle only covers a batch-straddling session
# if the replay fixture happens to split one — pin it deterministically)


class _FakeGroupState:
    """Minimal stand-in for pyspark's GroupState: carries the state tuple
    between direct invocations of the handler, never times out."""

    def __init__(self):
        self.exists = False
        self.hasTimedOut = False
        self._value = None

    @property
    def get(self):
        return self._value

    def update(self, value):
        self._value = tuple(value)
        self.exists = True

    def setTimeoutTimestamp(self, _ms):
        pass

    def remove(self):
        self._value = None
        self.exists = False


def _drive_handler(fn, batches):
    """Run a sessionize handler over successive micro-batches for user 7,
    returning the concatenated output frames."""
    import pandas as pd

    state = _FakeGroupState()
    out = []
    for epochs in batches:
        pdf = pd.DataFrame({"ts": pd.to_datetime(epochs, unit="s")})
        out.extend(fn((7,), iter([pdf]), state))
    return pd.concat(out, ignore_index=True)


def test_sessions_partials_merge_across_microbatch_boundary():
    """A session straddling two micro-batches emits one partial per batch,
    and the sum/min/max merge reconstructs exactly what the per-event
    handler (the equivalence-tested mode) aggregates to."""
    import pandas as pd

    from chilekids_etl_pipeline_spark.streaming.sessionize import (
        SESSION_GAP_S,
        _sessionize_group,
        _sessionize_partials_group,
    )

    # batch 1 ends mid-session; batch 2 continues it within the gap, then
    # opens a second session one-past the gap boundary
    b1 = [1_000, 1_100]
    b2 = [1_100 + SESSION_GAP_S, 1_100 + SESSION_GAP_S + 10,
          1_100 + 2 * SESSION_GAP_S + 11]
    partials = _drive_handler(_sessionize_partials_group, [b1, b2])

    # session 1 must appear once per batch (the straddle), session 2 once
    assert sorted(partials["session_seq"].tolist()) == [1, 1, 2]

    merged = (
        partials.groupby(["user_id", "session_seq"], as_index=False)
        .agg(
            n_events=("n_events", "sum"),
            session_start=("session_start", "min"),
            session_end=("session_end", "max"),
        )
        .sort_values("session_seq", ignore_index=True)
    )

    events = _drive_handler(_sessionize_group, [b1, b2])
    expected = (
        events.groupby(["user_id", "session_seq"], as_index=False)
        .agg(
            n_events=("ts", "count"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        )
        .sort_values("session_seq", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        merged.astype({"n_events": "int64"}),
        expected.astype({"n_events": "int64"}),
    )
    # and the straddled session's merged extent spans both batches
    assert merged.loc[0, "n_events"] == 4
    assert merged.loc[1, "n_events"] == 1
