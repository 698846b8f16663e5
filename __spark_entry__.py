"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json). The catalog itself lives in
``chilekids_etl_pipeline_spark.plans`` — this module is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from chilekids_etl_pipeline_spark import plans

plans.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's whole incremental-ELT loop (extract → hash
    → change-detect → upsert → monthly mart) as one composed Catalyst DAG,
    on /root/testdata/sf0.001."""
    return plans.queries()["elt_end_to_end"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return plans.queries()


def oracle_sql() -> dict[str, str]:
    return plans.oracle_sql()
