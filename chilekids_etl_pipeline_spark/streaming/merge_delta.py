"""Transactional MERGE upsert target (Delta Lake), jar-gated.

The reference's durable keyed table is Postgres ``INSERT … ON CONFLICT
(raw_id) DO UPDATE`` (src/transform.py:240-346, src/db.py:74-90). On a
lakehouse runtime the equivalent is ``MERGE INTO`` a Delta (or Iceberg)
table — transactional, concurrent-reader-safe, and a real table a BI
tool can point at. This module is that path: when the Delta jars are on
the classpath the foreachBatch body is a genuine ``MERGE INTO`` with
last-write-wins semantics and (appId, batchId) idempotent replay
protection (Delta's txnAppId/txnVersion); without the jars,
``streaming.incremental.merge_upsert_batch`` remains the portable
parquet-swap stand-in and ``start_upsert_sink`` dispatches automatically.

The two bodies implement the SAME contract (tested against each other's
scenario suite where the runtime allows): per-key last-write-wins within
a batch via ``order_cols`` descending, newer batches win across batches,
replayed batches are no-ops.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_DELTA_EXTENSION = "io.delta.sql.DeltaSparkSessionExtension"

# Delta's idempotent-write metadata for SQL MERGE rides on SESSION-global
# confs (txnAppId/txnVersion). Two upsert sinks sharing one SparkSession
# would race on them — one sink's MERGE could commit under the other's
# (appId, version) and a legitimate later batch would be wrongly skipped.
# This process-wide lock serializes the set → MERGE → unset critical
# section so concurrent foreachBatch threads can't interleave the confs.
_TXN_CONF_LOCK = threading.Lock()


def delta_available(spark: SparkSession) -> bool:
    """True when this session can actually run ``MERGE INTO delta.``.

    Two conditions, both required (jars alone are NOT enough — a session
    whose classpath happens to carry delta jars but was built without the
    catalyst extension fails at the first micro-batch, regressing a
    previously working parquet-swap sink):

    - ``io.delta.tables.DeltaTable`` resolves on the JVM classpath, and
    - ``spark.sql.extensions`` includes the Delta session extension
      (which injects the Delta SQL parser/analyzer rules MERGE needs).
    """
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "io.delta.tables.DeltaTable"
        )
    except Exception:
        return False
    try:
        exts = spark.conf.get("spark.sql.extensions", "") or ""
    except Exception:
        exts = ""
    return _DELTA_EXTENSION in exts


def _dedup_batch(
    batch: DataFrame, key_col: str, order_cols: tuple[str, ...]
) -> DataFrame:
    """Within-batch winner per key (the shuffle MERGE performs anyway):
    MERGE forbids multiple source matches per target row, so the batch
    must reduce to one row per key first."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        batch.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert_batch_delta(
    target_path: str,
    key_col: str = "raw_id",
    order_cols: tuple[str, ...] = ("received_at", "payload_hash"),
    sink_id: str = "default",
):
    """foreachBatch body: ``MERGE INTO delta.`target` `` — the
    transactional form of the parquet-swap upsert, with replay
    protection delegated to Delta's idempotent-write metadata:
    ``txnAppId`` = sink identity (derived from the checkpoint path by
    ``start_upsert_sink``), ``txnVersion`` = batch id. A replayed batch
    (same app id, same version) is skipped by Delta itself — the same
    (sink_id, batch_id) keying the swap path implements by hand."""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        deduped = _dedup_batch(batch, key_col, order_cols)
        # idempotent-writes metadata: scoped to this transaction via
        # session confs (the documented path for SQL-driven writes —
        # requires Delta >= 2.3, where idempotent DML honors these confs;
        # older Delta only scoped them to DataFrameWriter writes). The
        # confs are session-GLOBAL, so the whole set → MERGE → unset
        # section holds _TXN_CONF_LOCK: concurrent sinks in one session
        # serialize instead of committing under each other's identity.
        # `with` (not manual acquire/release) so a conf.set raising — e.g.
        # on a stopped session — can't leak the process-wide lock and
        # deadlock every other Delta sink's next micro-batch.
        with _TXN_CONF_LOCK:
            try:
                spark.conf.set(
                    "spark.databricks.delta.write.txnAppId", sink_id
                )
                spark.conf.set(
                    "spark.databricks.delta.write.txnVersion",
                    str(int(batch_id)),
                )
                import os

                is_delta = os.path.exists(
                    os.path.join(target_path, "_delta_log")
                )
                if os.path.exists(target_path) and not is_delta and (
                    os.listdir(target_path)
                ):
                    # an existing parquet-swap target: creating a fresh
                    # Delta table here would orphan every previously
                    # upserted row (the new log references none of the
                    # old files)
                    raise RuntimeError(
                        f"{target_path} holds a non-Delta table; migrate "
                        "it explicitly (read parquet, write delta) before "
                        "switching the sink to MERGE"
                    )
                if not is_delta:
                    deduped.write.format("delta").mode("overwrite").save(
                        target_path
                    )
                    return
                deduped.createOrReplaceTempView("_merge_updates")
                set_cols = ", ".join(
                    f"t.{c} = s.{c}" for c in deduped.columns if c != key_col
                )
                spark.sql(
                    f"""
                    MERGE INTO delta.`{target_path}` t
                    USING _merge_updates s
                    ON t.{key_col} = s.{key_col}
                    WHEN MATCHED THEN UPDATE SET {set_cols}
                    WHEN NOT MATCHED THEN INSERT *
                    """
                )
            finally:
                for conf in (
                    "spark.databricks.delta.write.txnAppId",
                    "spark.databricks.delta.write.txnVersion",
                ):
                    try:
                        spark.conf.unset(conf)
                    except Exception:
                        pass  # stopped session: nothing to unset

    return _merge
