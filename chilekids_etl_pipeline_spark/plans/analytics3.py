"""Round-2 analytics: bucketed interval (range) join and vector aggregation.

Both are shapes Spark lacks as primitives and the reference computes
row-at-a-time or not at all; here each is expressed as a composition of
equi-join/aggregation primitives so Catalyst plans them shuffle-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# interval join, bucketed: errors in the 15 minutes before each purchase

_BUCKET_S = 900  # bucket width == window width → a window spans ≤ 2 buckets


_RANGE_ORACLE = """
SELECT p.event_id, cast(count(e.ets) AS bigint) AS n_errors_15m
FROM (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
LEFT JOIN (SELECT ts AS ets FROM events WHERE event_type = 'error') e
  ON e.ets >= p.ts - INTERVAL 15 MINUTE AND e.ets < p.ts
GROUP BY p.event_id
"""


@register("range_join_purchase_errors", oracle=_RANGE_ORACLE)
def range_join_purchase_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join without an equi key — the shape that naively plans as
    a nested-loop cross product. The scale recipe: bucket the right side
    by the window width (15 min), explode each probe to its two candidate
    buckets, equi-join on bucket, apply the exact range predicate inside
    the join condition. Work is probes x events-per-bucket instead of
    probes x events; the oracle states the plain non-equi join."""
    ev = load_table(spark, sf_dir, "events")
    err = (
        ev.filter(F.col("event_type") == "error")
        .select(F.col("ts").alias("ets"))
        .withColumn("bkt", F.floor(F.unix_timestamp("ets") / _BUCKET_S))
    )
    pur = (
        ev.filter(F.col("event_type") == "purchase")
        .select("event_id", "ts")
        .withColumn("b0", F.floor(F.unix_timestamp("ts") / _BUCKET_S))
        .withColumn("bkt", F.explode(F.array(F.col("b0"), F.col("b0") - 1)))
    )
    j = pur.join(
        err,
        (pur.bkt == err.bkt)
        & (err.ets >= pur.ts - F.expr("INTERVAL 15 MINUTES"))
        & (err.ets < pur.ts),
        "left",
    )
    return j.groupBy("event_id").agg(F.count("ets").alias("n_errors_15m"))


# ---------------------------------------------------------------------------
# per-label embedding centroids (vector aggregation, long-form layout)


_CENTROID_ORACLE = """
WITH dims AS (
    SELECT label,
           unnest(range(0, len(embedding))) AS pos,
           unnest(embedding) AS v
    FROM embeddings
)
SELECT label, pos, round(avg(v), 6) AS c, count(*) AS n_vecs
FROM dims
GROUP BY label, pos
"""


@register("embedding_centroids", oracle=_CENTROID_ORACLE)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column — the building block of
    IVF training, class prototypes, and drift monitoring. posexplode to
    (label, dim, value) and aggregate: one shuffle on (label, dim) with
    map-side partial sums, linear in vectors x dims — never a
    driver-side numpy reduce. Long-form output (label, pos, c) is the
    layout that stays queryable at any dimensionality."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    return dims.groupBy("label", "pos").agg(
        F.round(F.avg("v"), 6).alias("c"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


# ---------------------------------------------------------------------------
# per-type z-score outliers (anomaly detection over exact moment sums)


_OUTLIER_ORACLE = """
WITH stats AS (
    SELECT event_type,
           count(*) AS n,
           cast(sum(cast(value AS decimal(10,2))) AS double) AS s1,
           cast(sum(cast(value AS decimal(10,2))
                    * cast(value AS decimal(10,2))) AS double) AS s2
    FROM events GROUP BY event_type
),
m AS (
    SELECT event_type, n, s1 / n AS mean,
           sqrt((s2 / n - (s1 / n) * (s1 / n)) * n / (n - 1)) AS std
    FROM stats
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - m.mean) / m.std AS z
FROM events e JOIN m ON e.event_type = m.event_type
WHERE abs((e.value - m.mean) / m.std) > 3.0
"""


@register("events_value_outliers", oracle=_OUTLIER_ORACLE)
def events_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomaly detection: per-type z-score outliers (|z| > 3). The moment
    sums are exact decimals (order-independent, merge-safe — the form that
    stays correct under any partial-aggregation schedule), converted to
    double only for the final mean/std; sqrt is IEEE-correctly-rounded so
    both engines derive identical z values. One aggregation + one broadcast
    join of the tiny per-type stats back onto the stream."""
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(10,2)")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec).cast("double").alias("s1"),
        F.sum(dec * dec).cast("double").alias("s2"),
    )
    m = stats.select(
        "event_type",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("s2") / F.col("n") - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n")))
            * F.col("n")
            / (F.col("n") - 1)
        ).alias("std"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        ev.join(F.broadcast(m), "event_type")
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > 3.0)
        .select("event_id", "event_type", "value", "z")
    )


# ---------------------------------------------------------------------------
# trailing 7-day rolling revenue (RANGE window frame over event time)


_ROLLING_ORACLE = """
WITH daily AS (
    SELECT cast(date_diff('day', DATE '1995-01-01', o_orderdate) AS bigint) AS day_no,
           min(cast(o_orderdate AS date)) AS day,
           sum(cast(o_totalprice AS decimal(18,2))) AS revenue_dec,
           count(*) AS n_orders
    FROM orders GROUP BY day_no
)
SELECT day, cast(revenue_dec AS double) AS revenue, n_orders,
       cast(sum(revenue_dec) OVER (
           ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS double) AS revenue_7d,
       cast(sum(n_orders) OVER (
           ORDER BY day_no RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
       ) AS bigint) AS orders_7d
FROM daily
"""


@register("rolling_7d_revenue", oracle=_ROLLING_ORACLE)
def rolling_7d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day rolling revenue — a RANGE window frame keyed on event
    time (day number), which unlike a ROWS frame stays correct across gaps
    in the calendar. Daily pre-aggregation first, and the rolling sums run
    on exact decimals — window engines associate frame sums differently
    (segment trees vs incremental add/remove), so double sums inside a
    frame are NOT portable; decimals are, cast to double only on output.
    An unpartitioned time-ordered window is fine here because the daily
    rollup is small; at finer granularity it would partition by month and
    stitch boundaries."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("bigint")
        .alias("day_no")
    ).agg(
        F.min(F.col("o_orderdate").cast("date")).alias("day"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue_dec"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    w = Window.orderBy("day_no").rangeBetween(-6, 0)
    return daily.select(
        "day",
        F.col("revenue_dec").cast("double").alias("revenue"),
        "n_orders",
        F.sum("revenue_dec").over(w).cast("double").alias("revenue_7d"),
        F.sum("n_orders").over(w).cast("bigint").alias("orders_7d"),
    )
