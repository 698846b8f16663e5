"""Mart-layer queries (#6-12 in SURVEY.md §2).

The reference computes these as Postgres views over staging.records
(alembic 129f09ac6c14, b80da1af78f7) and a driver-side pandas group-agg
(src/marts.py:9-42). Here each is a declarative Spark plan over the star
schema: orders/customer play the transaction ledger, part/supplier the
category/vendor dimensions, events.props the campaign payloads.

Scale notes: every join against a dimension table (customer, part, nation)
is an explicit broadcast — no shuffle of the fact side; aggregations are
partial (map-side combine) by construction; money sums are exact
decimal(18,2) so results are engine-portable and merge-order-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..operators.dims import distinct_dimension, merge_dimension
from ..sources.tables import load_table
from .registry import register

# --- 6. financials_v: monthly rollup by type with date coalesce + cutoff


_FINANCIALS_ORACLE = """
WITH txns AS (
    SELECT o_orderstatus AS type,
           coalesce(CASE WHEN o_orderkey % 7 = 0 THEN NULL
                         ELSE o_orderdate + INTERVAL 3 DAY END,
                    o_orderdate) AS eff_date,
           cast(o_totalprice AS decimal(18,2)) AS total
    FROM orders
)
SELECT strftime(date_trunc('month', eff_date), '%Y-%m') AS year_month,
       type,
       cast(round(sum(total), 0) AS double) AS total_price,
       count(*) AS record_count
FROM txns
WHERE eff_date >= TIMESTAMP '1996-06-01'
GROUP BY year_month, type
"""


@register("financials_monthly", oracle=_FINANCIALS_ORACLE)
def financials_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """marts.financials_v (alembic 129f09ac6c14): month(coalesce(payment
    date, date)) × type, ROUND(SUM(amount)), count, with a date cutoff.
    payment_date is simulated as orderdate+3d, absent for every 7th order."""
    o = load_table(spark, sf_dir, "orders")
    txns = o.select(
        F.col("o_orderstatus").alias("type"),
        F.coalesce(
            F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
                F.col("o_orderdate") + F.expr("INTERVAL 3 DAY")
            ),
            F.col("o_orderdate"),
        ).alias("eff_date"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("total"),
    )
    return (
        txns.filter(F.col("eff_date") >= F.lit("1996-06-01").cast("timestamp"))
        .groupBy(
            F.date_format(F.date_trunc("month", "eff_date"), "yyyy-MM").alias("year_month"),
            "type",
        )
        .agg(
            F.round(F.sum("total"), 0).cast("double").alias("total_price"),
            F.count(F.lit(1)).alias("record_count"),
        )
    )


# --- 7. expenses_by_category_v: category rollup with null bucketing


_EXPENSES_ORACLE = """
SELECT coalesce(CASE WHEN p_size % 11 = 0 THEN NULL ELSE p_type END,
                'Uncategorized') AS category,
       cast(round(sum(cast(l_extendedprice AS decimal(18,2))), 0) AS double)
           AS total_price,
       count(*) AS record_count
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_returnflag = 'R'
GROUP BY category
"""


@register("expenses_by_category", oracle=_EXPENSES_ORACLE)
def expenses_by_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """marts.expenses_by_category_v: COALESCE(category,'Uncategorized')
    rollup over the expense subset. part is broadcast — the lineitem fact
    never shuffles for the join, only for the (partial) aggregation."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.coalesce(
            F.when(F.col("p_size") % 11 == 0, F.lit(None)).otherwise(F.col("p_type")),
            F.lit("Uncategorized"),
        ).alias("category"),
    )
    return (
        li.join(broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("category")
        .agg(
            F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 0)
            .cast("double")
            .alias("total_price"),
            F.count(F.lit(1)).alias("record_count"),
        )
    )


# --- 8. web_transactions_v: clean projection


_WEB_TXN_ORACLE = """
SELECT o_orderkey AS raw_id,
       o_orderdate AS date,
       o_orderstatus AS type,
       c_name AS client,
       c_mktsegment AS segment,
       cast(o_totalprice AS double) AS total,
       o_orderpriority AS priority
FROM orders JOIN customer ON o_custkey = c_custkey
"""


@register("web_transactions", oracle=_WEB_TXN_ORACLE)
def web_transactions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """marts.web_transactions_v: technical-field-free projection for the
    web app, with the client dimension joined in (broadcast)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(broadcast(c), o.o_custkey == c.c_custkey).select(
        F.col("o_orderkey").alias("raw_id"),
        F.col("o_orderdate").alias("date"),
        F.col("o_orderstatus").alias("type"),
        F.col("c_name").alias("client"),
        F.col("c_mktsegment").alias("segment"),
        F.col("o_totalprice").cast("double").alias("total"),
        F.col("o_orderpriority").alias("priority"),
    )


# --- 9. dim_clients_v: explicit ∪ implicit with precedence dedup


_DIM_CLIENTS_ORACLE = """
WITH explicit AS (
    SELECT c_name AS name, TIMESTAMP '2024-06-01' AS updated_at,
           'manual' AS origin
    FROM customer WHERE c_custkey % 3 = 0
),
implicit AS (
    SELECT DISTINCT c_name AS name, CAST(NULL AS TIMESTAMP) AS updated_at,
           'transaction' AS origin
    FROM orders JOIN customer ON o_custkey = c_custkey
),
unioned AS (
    SELECT * FROM explicit UNION ALL SELECT * FROM implicit
)
SELECT name, updated_at, origin
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY name
        ORDER BY origin DESC, updated_at DESC NULLS LAST) AS rn
    FROM unioned
) WHERE rn = 1
"""


@register("dim_clients", oracle=_DIM_CLIENTS_ORACLE)
def dim_clients(spark: SparkSession, sf_dir: str) -> DataFrame:
    """marts.dim_clients_v: explicit reference rows (every 3rd customer,
    playing source_type='ref_clients') unioned with implicit distinct
    clients from transactions; one row per name by origin precedence
    (reference keeps the greatest origin — reproduced exactly)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    explicit = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_name").alias("name"),
        F.lit("2024-06-01").cast("timestamp").alias("updated_at"),
        F.lit("manual").alias("origin"),
    )
    implicit = (
        o.join(broadcast(c), o.o_custkey == c.c_custkey)
        .select(F.col("c_name").alias("name"))
        .distinct()
        .select(
            "name",
            F.lit(None).cast("timestamp").alias("updated_at"),
            F.lit("transaction").alias("origin"),
        )
    )
    return merge_dimension(explicit, implicit)


# --- 10/11. dim_categories_v / dim_vendors_v: distinct dimensions


_DIM_CATEGORIES_ORACLE = """
SELECT DISTINCT p_type AS name FROM part
WHERE p_type IS NOT NULL AND p_type <> ''
"""


@register("dim_categories", oracle=_DIM_CATEGORIES_ORACLE)
def dim_categories(spark: SparkSession, sf_dir: str) -> DataFrame:
    """marts.dim_categories_v: distinct non-empty category values."""
    return distinct_dimension(load_table(spark, sf_dir, "part"), "p_type")


_DIM_VENDORS_ORACLE = """
SELECT DISTINCT s_name AS name FROM supplier
WHERE s_name IS NOT NULL AND s_name <> ''
"""


@register("dim_vendors", oracle=_DIM_VENDORS_ORACLE)
def dim_vendors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """marts.dim_vendors_v: distinct non-empty vendor values."""
    return distinct_dimension(load_table(spark, sf_dir, "supplier"), "s_name")


# --- 12. campaigns_summary: JSON-payload group aggregation


_CAMPAIGNS_ORACLE = """
SELECT json_extract_string(props, '$.k') AS campaign_id,
       count(CASE WHEN event_type = 'view' THEN 1 END) AS impressions,
       count(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
       cast(sum(CASE WHEN event_type = 'purchase'
                     THEN cast(value AS decimal(10,2)) END) AS double) AS cost
FROM events
GROUP BY campaign_id
"""


@register("campaigns_summary", oracle=_CAMPAIGNS_ORACLE)
def campaigns_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """src/marts.py:9-42 build_campaigns_summary: group raw JSON payloads by
    campaign key, sum impressions/clicks/cost — but distributed (the
    reference collects all payloads to the driver; here the JSON extraction
    and conditional aggregation run JVM-side with partial aggregation)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.get_json_object("props", "$.k").alias("campaign_id"),
            "event_type",
            "value",
        )
        .groupBy("campaign_id")
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias("impressions"),
            F.count(F.when(F.col("event_type") == "click", 1)).alias("clicks"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(10,2)"),
                )
            )
            .cast("double")
            .alias("cost"),
        )
    )
