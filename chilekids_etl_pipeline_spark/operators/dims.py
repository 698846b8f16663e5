"""Dimension extraction with origin precedence.

Reference: alembic/versions/b80da1af78f7 — dim_clients_v unions an explicit
reference feed with implicit distinct values from transactions, then keeps
one row per name via ``DISTINCT ON (name) … ORDER BY name, origin DESC``.
(Note the reference's code picks the lexicographically-greatest origin; we
reproduce that behavior exactly, quirk included.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_dimension(explicit: DataFrame, implicit: DataFrame) -> DataFrame:
    """Union two (name, updated_at, origin) frames, keep one row per name
    preferring the greatest origin (and greatest updated_at as tiebreak)."""
    unioned = explicit.unionByName(implicit)
    w = Window.partitionBy("name").orderBy(
        F.col("origin").desc(), F.col("updated_at").desc_nulls_last()
    )
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def distinct_dimension(df: DataFrame, col: str) -> DataFrame:
    """Distinct non-null, non-empty values of a column as dimension rows."""
    return (
        df.select(F.col(col).alias("name"))
        .filter(F.col("name").isNotNull() & (F.col("name") != ""))
        .distinct()
    )
