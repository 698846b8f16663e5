"""Parquet table catalog for the test star schema.

At 100 TB these reads stay efficient because every query selects columns
explicitly (parquet column pruning) and filters early (predicate pushdown
into the scan) — verified via ``explain`` in tests.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Rebalance only genuinely fact-sized tables; dimension scans stay as-is
# (they broadcast anyway, and an extra exchange would only add latency).
_REBALANCE_MIN_ROWS = 50_000


@lru_cache(maxsize=256)
def _single_split_rows(path: str) -> int | None:
    """Rows in ``path`` if it is a single-row-group file (= one Spark scan
    split, parquet splits only at row-group boundaries); None otherwise."""
    try:
        import pyarrow.parquet as pq

        f = pq.ParquetFile(path)
        if f.num_row_groups <= 1:
            return int(f.metadata.num_rows)
    except Exception:
        pass
    return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    path = f"{sf_dir}/{name}.parquet"
    df = spark.read.parquet(path)
    if name == "events":
        # TIMESTAMP(NANOS) parquet read as long (see session.py); truncate
        # to micros — same truncation DuckDB applies when it loads nanos.
        ts_field = df.schema["ts"]
        if isinstance(ts_field.dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # Local-runtime scan rebalance: the test tables are single-row-group
    # files, so every scan is ONE task no matter how many cores exist —
    # the scan+partial-agg stage of every fact query runs single-threaded.
    # Repartitioning right above the scan restores parallelism; predicate
    # pushdown and column pruning still reach the scan (filters and
    # projections commute with a round-robin exchange), so the shuffle
    # moves only the filtered, pruned rows. Gated to local masters AND
    # big single-split files: on a real cluster the file layout provides
    # splits and this never fires — a 100 TB table is never one row group.
    if spark.sparkContext.master.startswith("local"):
        rows = _single_split_rows(path)
        if rows is not None and rows >= _REBALANCE_MIN_ROWS:
            df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so plans can use spark.sql."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
