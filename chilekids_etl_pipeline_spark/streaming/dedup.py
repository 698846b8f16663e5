"""Streaming dedup against a static corpus: the continuous twin of the
batch dedup_incremental_batch entry (plans/llmdata.py).

The daily-ingest shape at 100 TB: the existing corpus is reduced ONCE to
a signature table (content hash, optionally MinHash bands), and each
arriving micro-batch of new documents left-anti joins it — a
stream-static join, one of the supported Structured Streaming join
shapes. The static side is resolved per micro-batch against the current
snapshot, so a nightly signature refresh is picked up without restarting
the stream; no streaming state is kept for the corpus side at all (the
signature table IS the state, stored where it belongs — in the lake).

Batch-equivalence pinned in tests/test_streaming.py: streamed survivors
== the batch anti join on the same drops. Reference parity: this is the
reference's raw-vs-staging payload_hash anti-join (transform.py:200-234)
run continuously against an external corpus instead of staging.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_signatures(docs: DataFrame) -> DataFrame:
    """Reduce a document corpus to its content-signature table (distinct
    md5). At scale this is the only corpus-wide pass, done once per
    refresh cycle, and its output is small enough to broadcast for
    modest corpora or shuffle-join for web scale."""
    return docs.select(F.md5(F.col("text")).alias("h")).distinct()


def dedup_stream_against_corpus(
    new_docs: DataFrame, signatures: DataFrame
) -> DataFrame:
    """Left-anti stream-static join: keep only documents whose content
    hash is NOT in the corpus signature table. Within-batch duplicates
    survive here by design (the corpus gate is cross-corpus; in-flight
    dedup is dropDuplicatesWithinWatermark upstream, see
    streaming/incremental.py)."""
    hashed = new_docs.withColumn("h", F.md5(F.col("text")))
    return hashed.join(signatures, "h", "left_anti")


def start_corpus_dedup_stream(
    new_docs: DataFrame,
    signatures: DataFrame,
    table_name: str = "novel_docs",
):
    """Run the corpus gate continuously into a memory sink (append mode:
    a kept document is final — anti-join emission is monotone for an
    append-only static side). Returns the StreamingQuery."""
    kept = dedup_stream_against_corpus(new_docs, signatures)
    return (
        kept.writeStream.outputMode("append")
        .format("memory")
        .queryName(table_name)
        .trigger(availableNow=True)
        .start()
    )
