"""Extended analytics (#31-34 in SURVEY.md §2 extension): as-of join,
rollup hierarchies, selective single-agg, and EXISTS/semi-join shapes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.asof import asof_join
from ..sources.tables import load_table
from .registry import register

# --- 31. as-of (backward) join: purchase → most recent prior view per user


_ASOF_ORACLE = """
SELECT p.event_id, p.user_id, p.ts AS purchase_ts, v.ts AS view_ts,
       (epoch_us(p.ts) - epoch_us(v.ts)) / 1000000.0 AS gap_s
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
ON p.user_id = v.user_id AND p.ts >= v.ts
"""


@register("asof_view_to_purchase", oracle=_ASOF_ORACLE)
def asof_view_to_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert: each purchase matched to the user's most recent
    view at-or-before it. Spark has no ASOF JOIN; operators.asof implements
    it as union + single-shuffle carry-forward window (no range join).
    Oracle uses DuckDB's native ASOF JOIN — two independent formulations."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    views = ev.filter(F.col("event_type") == "view").select("user_id", "ts")
    joined = asof_join(purchases, views, on="user_id", ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("asof_ts").alias("view_ts"),
        (
            (F.unix_micros("ts") - F.unix_micros("asof_ts")) / F.lit(1000000.0)
        ).alias("gap_s"),
    )


# --- 32. rollup hierarchy (year_month × type → month subtotal → grand total)


_ROLLUP_ORACLE = """
SELECT coalesce(year_month, 'ALL') AS year_month,
       coalesce(type, 'ALL') AS type,
       cast(sum(total) AS double) AS total_price,
       count(*) AS record_count
FROM (
    SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS year_month,
           o_orderstatus AS type,
           cast(o_totalprice AS decimal(18,2)) AS total
    FROM orders
)
GROUP BY ROLLUP (year_month, type)
"""


@register("financials_rollup", oracle=_ROLLUP_ORACLE)
def financials_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """financials_v extended to the full subtotal hierarchy via ROLLUP —
    one pass computes month×type, month, and grand totals (partial
    aggregation applies to every grouping set)."""
    o = load_table(spark, sf_dir, "orders")
    txns = o.select(
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM").alias("year_month"),
        F.col("o_orderstatus").alias("type"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
    )
    return (
        txns.rollup("year_month", "type")
        .agg(
            F.sum("total").cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("record_count"),
        )
        .select(
            F.coalesce("year_month", F.lit("ALL")).alias("year_month"),
            F.coalesce("type", F.lit("ALL")).alias("type"),
            "total_price",
            "record_count",
        )
    )


# --- 33. Q6-style selective single aggregate


_Q6_ORACLE = """
SELECT cast(sum(cast(l_extendedprice AS decimal(18,2))
             * cast(l_discount AS decimal(18,2))) AS double) AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("q6_forecast_revenue", oracle=_Q6_ORACLE)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highly selective scan-and-aggregate: all four predicates push into
    the parquet scan; no shuffle beyond the single-row final agg."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * F.col("l_discount").cast("decimal(18,2)")
        )
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --- 34. EXISTS / semi-join shape


_LATE_SHIP_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
"""


@register("late_shipment_orders", oracle=_LATE_SHIP_ORACLE)
def late_shipment_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders with at least one lineitem shipped >90 days after order date
    — LEFT SEMI join (the EXISTS shape: no duplication, no row blowup)."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (li.l_orderkey == o.o_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


# ---------------------------------------------------------------------------
# time-window aggregations (tumbling + sliding) — the Structured Streaming
# window shapes, run in batch so the oracle can check them


_TUMBLING_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       count(*) AS n,
       cast(round(sum(cast(value AS decimal(10,2))), 2) AS double) AS total
FROM events
GROUP BY date_trunc('hour', ts), event_type
"""


@register("events_hourly_tumbling", oracle=_TUMBLING_ORACLE)
def events_hourly_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type via ``F.window`` — the exact
    groupBy a Structured Streaming job runs with a watermark; in batch the
    window expression is a plain epoch-aligned bucket (== date_trunc)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(10,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total")
    )


_SLIDING_ORACLE = """
WITH slid AS (
    SELECT unnest([date_trunc('hour', ts),
                   date_trunc('hour', ts) - INTERVAL 1 HOUR]) AS window_start,
           value
    FROM events
)
SELECT window_start,
       count(*) AS n,
       cast(round(sum(cast(value AS decimal(10,2))), 2) AS double) AS total
FROM slid
GROUP BY window_start
"""


@register("events_sliding_2h1h", oracle=_SLIDING_ORACLE)
def events_sliding_2h1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding every hour: each event lands in exactly two
    windows (``F.window`` duplicates rows window-side, not data-side — the
    blowup factor is window/slide, bounded and explicit)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(10,2)")), 2)
            .cast("double")
            .alias("total"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "total")
    )


# ---------------------------------------------------------------------------
# pivot + CUBE — the remaining reshaping aggregation shapes


_PIVOT_ORACLE = """
SELECT l_returnflag,
       cast(round(sum(CASE WHEN l_linestatus = 'F' THEN cast(l_extendedprice AS decimal(12,2)) END), 2) AS double) AS status_f,
       cast(round(sum(CASE WHEN l_linestatus = 'O' THEN cast(l_extendedprice AS decimal(12,2)) END), 2) AS double) AS status_o
FROM lineitem
GROUP BY l_returnflag
"""


@register("revenue_pivot_by_status", oracle=_PIVOT_ORACLE)
def revenue_pivot_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide reshaping via ``pivot`` with explicit pivot values — explicit
    values keep it a single-pass conditional aggregation (no extra distinct
    job, schema stable at plan time — required at cluster scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")), 2))
    )
    return out.select(
        "l_returnflag",
        F.col("F").cast("double").alias("status_f"),
        F.col("O").cast("double").alias("status_o"),
    )


_CUBE_ORACLE = """
SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
       coalesce(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       cast(round(sum(cast(l_extendedprice AS decimal(12,2))), 2) AS double) AS revenue
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


@register("revenue_cube", oracle=_CUBE_ORACLE)
def revenue_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 2^2 grouping sets in one
    pass — Spark expands grouping sets map-side, so the shuffle carries
    each row once per set but aggregates partially first."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(12,2)")), 2)
            .cast("double")
            .alias("revenue"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "revenue",
        )
    )


# ---------------------------------------------------------------------------
# Q13-shape: outer-join aggregate distribution (customers with zero orders
# must appear — the shape an inner join silently gets wrong)


_CUSTDIST_ORACLE = """
SELECT c_count, count(*) AS custdist
FROM (
    SELECT c.c_custkey, count(o.o_orderkey) AS c_count
    FROM customer c
    LEFT OUTER JOIN orders o
           ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
)
GROUP BY c_count
"""


@register("customer_order_distribution", oracle=_CUSTDIST_ORACLE)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with the filter in the JOIN
    condition (not WHERE — that would turn it inner and drop zero-order
    customers), two-level aggregation to a histogram."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (o.o_custkey == c.c_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# correlated-subquery shape: rows above their group's mean, decorrelated


_ABOVE_AVG_ORACLE = """
SELECT o_orderpriority,
       count(*) AS n,
       cast(round(sum(cast(o_totalprice AS decimal(12,2))), 2) AS double) AS total
FROM orders o
WHERE o_totalprice > (
    SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey
)
GROUP BY o_orderpriority
"""


@register("orders_above_customer_avg", oracle=_ABOVE_AVG_ORACLE)
def orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated scalar subquery (each order vs its customer's average)
    decorrelated into a window — one shuffle on the correlation key instead
    of a per-row subquery; Catalyst plans the DuckDB-style correlated form
    the same way, the window states it directly."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    above = o.withColumn("cust_avg", F.avg("o_totalprice").over(w)).filter(
        F.col("o_totalprice") > F.col("cust_avg")
    )
    return above.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(12,2)")), 2)
        .cast("double")
        .alias("total"),
    )


# ---------------------------------------------------------------------------
# cohort retention: first-seen cohort × day offset → active user counts


_RETENTION_ORACLE = """
WITH activity AS (
    SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
),
cohort AS (
    SELECT user_id, min(day) AS cohort_day FROM activity GROUP BY user_id
)
SELECT c.cohort_day,
       date_diff('day', c.cohort_day, a.day) AS day_offset,
       count(DISTINCT a.user_id) AS n_users
FROM activity a
JOIN cohort c USING (user_id)
WHERE date_diff('day', c.cohort_day, a.day) <= 7
GROUP BY c.cohort_day, day_offset
"""


@register("events_cohort_retention", oracle=_RETENTION_ORACLE)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users bucketed by first-active day, counted
    on each later day (offset ≤ 7). Two aggregations + one join, all keyed
    on user_id so the shuffles line up; the cohort table is the small side
    at scale and broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    joined = activity.join(cohort, "user_id").withColumn(
        "day_offset", F.datediff(F.col("day"), F.col("cohort_day"))
    )
    return (
        joined.filter(F.col("day_offset") <= 7)
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
