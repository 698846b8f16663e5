"""Analytical queries (#13-18 in SURVEY.md §2) — the marts layer "at scale".

The reference's analytics live in SQL views over a single staging table;
these queries prove the same capabilities (rollups, multi-way star joins,
top-N, sessionization, funnels) on the full star schema with plans that
survive 100 TB: broadcast joins for dimensions, partial aggregation,
single-shuffle windows, exact decimal money math cast to double at the end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..sources.tables import load_table, maybe_rebalance
from .registry import register

# --- 13. Q1-style pricing summary (scan-heavy groupBy, no join)


# Precision discipline (found by the sf1 sweep): with every factor at
# decimal(18,2) the triple product price*(1-disc)*(1+tax) needs
# precision > 38, and engines disagree on precision-loss behavior
# (Spark truncates scale, DuckDB re-plans) — the sums visibly diverge
# once they reach ~5e10. Narrow casts keep every intermediate INSIDE
# 38 digits so both engines compute the same exact decimal:
# (15,2) x (5,3) -> (21,5); x (5,3) -> (27,8); sums -> (38,8). Exact.
#
# Second sf1 finding: even on IDENTICAL exact decimal sums, a direct
# decimal->double cast differs by 1 ulp between engines once the
# unscaled value passes 2^53 (DuckDB divides a float-converted int128
# by 10^scale — two roundings; the JVM rounds once). The portable cast
# splits integer and fractional parts, each small enough to convert
# with one well-defined IEEE rounding: floor(x) is exact in both, the
# fraction's unscaled value < 10^scale converts exactly then divides
# once, and the final add is a single IEEE operation.
def _dec2double(x: str) -> str:
    """Portable exact-decimal -> double cast (see note above)."""
    return f"(cast(floor({x}) AS double) + cast({x} - floor({x}) AS double))"


_Q1_DISC_SUM = ("sum(cast(l_extendedprice AS decimal(15,2)) "
                "* (1 - cast(l_discount AS decimal(5,3))))")
_Q1_CHARGE_SUM = ("sum(cast(l_extendedprice AS decimal(15,2)) "
                  "* (1 - cast(l_discount AS decimal(5,3))) "
                  "* (1 + cast(l_tax AS decimal(5,3))))")

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       cast(sum(cast(l_quantity AS decimal(15,2))) AS double) AS sum_qty,
       cast(sum(cast(l_extendedprice AS decimal(15,2))) AS double) AS sum_base_price,
       {_dp2} AS sum_disc_price,
       {_sc2} AS sum_charge,
       cast(sum(cast(l_quantity AS decimal(15,2))) AS double) / count(*) AS avg_qty,
       cast(sum(cast(l_extendedprice AS decimal(15,2))) AS double) / count(*) AS avg_price,
       cast(sum(cast(l_discount AS decimal(5,3))) AS double) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02'
GROUP BY l_returnflag, l_linestatus
""".replace("{_dp2}", _dec2double(_Q1_DISC_SUM)).replace(
    "{_sc2}", _dec2double(_Q1_CHARGE_SUM)
)


def _dec2double_col(c):
    """Column form of _dec2double: ulp-stable decimal->double."""
    return F.floor(c).cast("double") + (c - F.floor(c)).cast("double")


@register("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # A/B'd: this query is per-row-arithmetic-heavy (four decimal
    # product sums over every lineitem row), so widening past the
    # few-row-group local scan pays despite the exchange (1.5 → 1.1 s
    # at sf0.1) — unlike the short join/agg shapes where the same
    # rebalance was measured as a loss and reverted (commit df386f7).
    # filter BEFORE repartition: the predicate reaches the parquet scan
    # (PushedFilters) and the exchange ships only surviving rows
    li = maybe_rebalance(
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
    )
    # narrow decimals keep the triple product inside precision 38 —
    # see the note on _Q1_ORACLE (sf1-sweep finding)
    qty = F.col("l_quantity").cast("decimal(15,2)")
    price = F.col("l_extendedprice").cast("decimal(15,2)")
    disc = F.col("l_discount").cast("decimal(5,3)")
    tax = F.col("l_tax").cast("decimal(5,3)")
    cnt = F.count(F.lit(1))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        _dec2double_col(F.sum(price * (F.lit(1) - disc))).alias("sum_disc_price"),
        _dec2double_col(
            F.sum(price * (F.lit(1) - disc) * (F.lit(1) + tax))
        ).alias("sum_charge"),
        (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
        (F.sum(price).cast("double") / cnt).alias("avg_price"),
        (F.sum(disc).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


# --- 14. Q3-style shipping priority (selective join + agg + top-N)


_Q3_ORACLE = """
SELECT l_orderkey,
       cast(sum(cast(l_extendedprice AS decimal(18,2))
                * (1 - cast(l_discount AS decimal(18,2)))) AS double) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@register("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filters are declared on the base tables so Catalyst pushes them into
    the parquet scans; customer (filtered) broadcasts; only lineitem↔orders
    shuffles — and AQE shrinks that exchange after the selective filters."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# --- 15. Q5-style local supplier volume (6-way star join)


_Q5_ORACLE = """
SELECT n_name,
       cast(sum(cast(l_extendedprice AS decimal(18,2))
                * (1 - cast(l_discount AS decimal(18,2)))) AS double) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""


@register("q5_local_volume", oracle=_Q5_ORACLE)
def q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: all four dimension sides (customer, supplier, nation,
    region) broadcast; the only shuffle joins lineitem to orders."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


# --- 16. top-N per group (window)


_TOP_ORDERS_ORACLE = """
SELECT c_custkey, c_name, o_orderkey,
       cast(o_totalprice AS double) AS total, rank
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rank
    FROM orders
) JOIN customer ON o_custkey = c_custkey
WHERE rank <= 3
"""


@register("top_orders_per_customer", oracle=_TOP_ORDERS_ORACLE)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-N: one shuffle on the partition key, then a broadcast
    join to attach the dimension attributes."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    top = o.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)
    return top.join(broadcast(c), top.o_custkey == c.c_custkey).select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("total"),
        "rank",
    )


# --- 17. sessionization (lag + cumulative sum windows)


_SESSIONIZE_ORACLE = """
WITH gaps AS (
    SELECT user_id, event_id, ts, value,
           CASE WHEN ts - lag(ts) OVER w <= INTERVAL 30 MINUTE THEN 0 ELSE 1 END
               AS is_new
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, event_id, ts, value,
           cast(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS bigint) AS session_id
    FROM gaps
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(ts) AS session_start,
       max(ts) AS session_end,
       cast(sum(cast(value AS decimal(10,2))) AS double) AS total_value
FROM sessions
GROUP BY user_id, session_id
"""


@register("events_sessionize", oracle=_SESSIONIZE_ORACLE)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionize the event stream: 30-minute inactivity gap starts a new
    session. Both windows share one partitioning (user_id) → one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.withColumn(
        "is_new",
        F.when(
            F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w) <= 1800,
            0,
        ).otherwise(1),
    )
    sessions = gaps.withColumn(
        "session_id", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.sum(F.col("value").cast("decimal(10,2)")).cast("double").alias("total_value"),
    )


# --- 18. funnel (staged conditional aggregation)


_FUNNEL_ORACLE = """
WITH s1 AS (
    SELECT user_id, min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
    FROM events GROUP BY user_id
),
s2 AS (
    SELECT e.user_id, min(e.ts) AS t_click
    FROM events e JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'click' AND e.ts > s1.t_view
    GROUP BY e.user_id
),
s3 AS (
    SELECT e.user_id, min(e.ts) AS t_purchase
    FROM events e JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
    GROUP BY e.user_id
)
SELECT count(s1.t_view) AS n_view,
       count(s2.t_click) AS n_view_click,
       count(s3.t_purchase) AS n_view_click_purchase
FROM s1
LEFT JOIN s2 ON s1.user_id = s2.user_id
LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


@register("events_funnel", oracle=_FUNNEL_ORACLE)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel view→click→purchase per user: each stage's earliest
    qualifying timestamp must follow the previous stage's. All three stage
    aggregations partition on user_id, so AQE reuses the exchange."""
    ev = load_table(spark, sf_dir, "events")
    s1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view")
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .agg(
            F.count("t_view").alias("n_view"),
            F.count("t_click").alias("n_view_click"),
            F.count("t_purchase").alias("n_view_click_purchase"),
        )
    )
