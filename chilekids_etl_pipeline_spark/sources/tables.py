"""Parquet table catalog for the test star schema.

At 100 TB these reads stay efficient because every query selects columns
explicitly (parquet column pruning) and filters early (predicate pushdown
into the scan) — verified via ``explain`` in tests.
"""

from __future__ import annotations

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

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table.

    No blanket scan rebalance here, deliberately: the test tables are
    single-row-group files (every scan = one task), and an A/B at sf0.1
    showed a central repartition-after-scan helps only queries whose
    per-row downstream work is heavy (wide parses, shingling) while the
    extra exchange stage REGRESSES every short join/agg query by
    ~0.3-0.8 s of barrier+scheduling latency. The heavy queries
    (staging_records, training_data_pipeline) therefore rebalance
    explicitly where the CPU is, and everything else keeps the fused
    single-stage scan. On a real cluster the file layout provides splits
    and neither concern exists.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # TIMESTAMP(NANOS) parquet read as long (see session.py); truncate
        # to micros — same truncation DuckDB applies when it loads nanos.
        ts_field = df.schema["ts"]
        if isinstance(ts_field.dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so plans can use spark.sql."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
