"""As-of (backward) join: match each left row to the most recent right row
at or before it, per key.

Spark has no native ASOF JOIN; the scalable pattern is union + sort within
key + last-non-null carry-forward — ONE shuffle on the key, linear scan,
no range-join explosion. (A join with a `ts <= ts` range condition would be
a per-key cross product; this is the standard time-series alternative.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
) -> DataFrame:
    """For each left row: values of the latest right row with
    ``right.ts <= left.ts`` sharing the key (NULLs if none).

    Equal timestamps match (>= semantics, like DuckDB's ASOF JOIN).
    Returns the left rows plus ``asof_<col>`` for each requested right col
    and ``asof_ts``.
    """
    right_cols = right_cols or []
    lcols = left.columns
    tagged_l = left.select(
        F.col(on),
        F.col(ts),
        F.lit(1).alias("__is_left"),
        *[F.col(c) for c in lcols if c not in (on, ts)],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[ts].dataType).alias("__r_ts"),
    )
    tagged_r = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (on, ts)],
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(ts).alias("__r_ts"),
    )
    # right rows sort before left rows at equal ts → equal-ts rows match
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged_l.unionByName(tagged_r).select(
        "*",
        F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__is_left") == 1).drop(
        "__is_left", "__r_ts", *[f"__r_{c}" for c in right_cols]
    )
