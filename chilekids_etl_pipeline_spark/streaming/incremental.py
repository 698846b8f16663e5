"""Structured Streaming version of the incremental ELT pipeline.

The reference's ``python main.py run`` is a poll loop: fetch changed raw
records, normalize, upsert (main.py:33-139). As a continuous pipeline that
becomes: file/rate source → canonical payload hash → watermarked
dedup-by-hash → normalized append sink. ``dropDuplicates`` keyed on the
payload hash within the watermark is the streaming twin of the reference's
anti-join change detection; the watermark bounds state exactly like the
reference's ``last_seen`` tracking bounds its scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import with_payload_hash

EVENT_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def read_event_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 1) -> DataFrame:
    """File-source stream of event JSON/parquet drops (the Sheets poll,
    continuous). ``maxFilesPerTrigger`` paces micro-batches."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def incremental_normalize(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Hash, dedup within the watermark, normalize — the streaming ELT core."""
    canonical = F.concat(
        F.lit('{"event_type":"'),
        F.col("event_type"),
        F.lit('","user_id":'),
        F.col("user_id"),
        F.lit(',"value":'),
        F.col("value").cast("decimal(10,2)").cast("string"),
        F.lit("}"),
    )
    hashed = with_payload_hash(events, canonical)
    deduped = hashed.withWatermark("ts", watermark).dropDuplicates(["payload_hash"])
    return deduped.select(
        F.col("event_id").alias("raw_id"),
        F.col("ts").alias("received_at"),
        F.lit("live").alias("source_type"),
        "event_type",
        F.col("value").cast("decimal(10,2)").alias("amount"),
        "payload_hash",
    )


def start_to_memory(normalized: DataFrame, table_name: str = "staging_stream"):
    """Append sink into an in-memory table (tests); production would write
    a transactional table (Delta/Iceberg MERGE) or Kafka."""
    return (
        normalized.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
