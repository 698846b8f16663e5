"""Skew-mitigation operators.

A groupBy on a low-cardinality / skewed key sends every row of a hot key
through one reducer. Salting splits each key into ``salt_buckets``
sub-keys for a first partial aggregation, then combines the partials —
two small shuffles instead of one straggler. AQE's skew-join splitting
handles the JOIN side of this automatically; salting is the AGGREGATION
side, and the technique every 100 TB pipeline needs for count/sum over
power-law keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    salt_col: Column,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation, exact for algebraic aggregates.

    ``aggs`` maps output name → "sum:col" | "count:*" | "min:col" |
    "max:col". The salt is derived from a caller-supplied high-cardinality
    column (deterministic — reruns give identical partials).
    """
    partial_exprs = []
    final_exprs = []
    for out, spec in aggs.items():
        op, _, col = spec.partition(":")
        if op == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif op == "sum":
            partial_exprs.append(F.sum(col).alias(f"__p_{out}"))
            final_exprs.append(F.sum(f"__p_{out}").alias(out))
        elif op == "min":
            partial_exprs.append(F.min(col).alias(f"__p_{out}"))
            final_exprs.append(F.min(f"__p_{out}").alias(out))
        elif op == "max":
            partial_exprs.append(F.max(col).alias(f"__p_{out}"))
            final_exprs.append(F.max(f"__p_{out}").alias(out))
        else:
            raise ValueError(f"unsupported agg {spec!r}")

    partial = df.withColumn(
        "__salt", F.pmod(F.hash(salt_col), F.lit(salt_buckets))
    ).groupBy(*key_cols, "__salt").agg(*partial_exprs)
    return partial.groupBy(*key_cols).agg(*final_exprs)
