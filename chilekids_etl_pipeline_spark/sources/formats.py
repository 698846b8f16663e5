"""Text-format sources: CSV and JSON-lines with production defaults.

Two rules that matter at 100 TB:

- **Explicit schemas always.** ``inferSchema``/schema-less JSON reads scan
  the data once just to guess types — double I/O on the biggest asset, and
  a type can flip when a batch happens to be all-null. Every reader here
  requires a DDL schema string.
- **Quarantine, don't crash / don't silently drop.** PERMISSIVE mode with
  ``columnNameOfCorruptRecord`` keeps malformed rows as raw text in a
  ``_corrupt`` column; ``split_corrupt`` routes them to a quarantine frame
  the caller can land separately (the reference logs-and-skips bad rows —
  main.py:194; at scale you keep them for replay instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt"


def read_csv(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """CSV with explicit schema + corrupt-row capture."""
    return (
        spark.read.schema(f"{schema_ddl}, {CORRUPT_COL} string")
        .option("header", header)
        .option("delimiter", delimiter)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def read_json_lines(spark: SparkSession, path: str, schema_ddl: str) -> DataFrame:
    """JSON-lines with explicit schema + corrupt-row capture."""
    return (
        spark.read.schema(f"{schema_ddl}, {CORRUPT_COL} string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean rows without the corrupt column, quarantine rows as raw text).

    The parse is persisted first: Spark disallows querying only the
    corrupt-record column straight off a file scan (the parser would have
    nothing to fail on), and both outputs read the same parse anyway.
    """
    df = df.persist()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return clean, quarantine
