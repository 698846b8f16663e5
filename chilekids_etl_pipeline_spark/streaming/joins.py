"""Stream-stream interval join: attribute purchases to preceding views.

The batch catalog proves the as-of/range-join family
(asof_view_to_purchase, range_join_purchase_errors); this is the same
semantics as a CONTINUOUS pipeline — two live event streams joined on the
user key with a bounded time predicate. Structured Streaming turns the
time bound + watermarks into state eviction: a buffered view can be
dropped as soon as the purchase-side watermark passes its attribution
horizon, so state is O(events in the horizon window), not O(stream).

At cluster scale both sides hash-partition on the join key (user_id), so
the join is co-located stateful matching per key — the standard
stream-stream join layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def view_to_purchase_stream(
    events: DataFrame,
    horizon_minutes: int = 120,
    watermark: str = "1 hour",
) -> DataFrame:
    """Join each purchase to every view by the same user within the
    preceding ``horizon_minutes`` — the attribution interval join, live.

    Both sides carry a watermark and the join predicate bounds
    ``purchase_ts`` relative to ``view_ts``; together these let the state
    store evict expired views/purchases instead of buffering forever.
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    cond = F.expr(
        f"user_id = p_user_id AND purchase_ts >= view_ts "
        f"AND purchase_ts <= view_ts + INTERVAL {horizon_minutes} MINUTES"
    )
    return views.join(purchases, cond, "inner").select(
        "user_id",
        "view_id",
        "view_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )
