"""Sinks: how this engine lands data at 100 TB.

The reference upserts into Postgres (`INSERT … ON CONFLICT`,
src/transform.py:240-346) and rebuilds mart views. On a data lake the
equivalents are:

- **Dynamic partition overwrite** — recompute only the partitions a batch
  touches and swap them atomically; untouched partitions survive. This is
  the idempotent re-run story of the reference's keyed upsert, expressed
  for immutable storage (a transactional table format would add row-level
  MERGE on top; the partition-granularity form needs nothing but parquet).
- **Bucketed tables** — pre-shuffle a table by its join/agg key once at
  write time. Every later join or aggregation on that key reads co-located
  buckets and skips its exchange entirely: the write-once/shuffle-never
  trade that pays for itself after a single reuse at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    max_records_per_file: int = 5_000_000,
) -> None:
    """Parquet append/overwrite at partition granularity.

    ``partitionOverwriteMode=dynamic`` (set per-write, not globally) makes
    overwrite replace ONLY partitions present in ``df`` — the lake-native
    idempotent upsert for reruns and late-arriving slices.
    """
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and bucket-sorted) table.

    Joins/aggregations on ``bucket_cols`` between tables bucketed the same
    way run with NO exchange — verified by plan assertion in
    tests/test_plans.py. ``sort_cols`` additionally pre-sorts each bucket,
    upgrading sort-merge joins to a merge without the sort.
    """
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Partition-discovering read; partition-column predicates prune
    directories before any file is opened."""
    return spark.read.parquet(path)
