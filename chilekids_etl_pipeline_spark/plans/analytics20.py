"""Analytics operators, batch 20 (round 7): net revenue retention.

Public recipe: NRR/GRR (the standard SaaS revenue-retention pair): for
each consecutive quarter, take the customers who paid in quarter q
(the base), and compare their quarter-q+1 spend against their
quarter-q spend — gross retention caps each customer at their prior
spend (pure shrinkage), net retention adds expansion. Both are exact
cent ratios in micros.

Dual-dialect SQL template; all money stays exact integer cents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


def _quarter(dialect: str, col: str) -> str:
    if dialect == "spark":
        return f"concat(year({col}), '-Q', quarter({col}))"
    return (f"cast(year({col}) AS varchar) || '-Q' || "
            f"cast(quarter({col}) AS varchar)")


def _qnum(dialect: str, col: str) -> str:
    # sortable quarter index: 4*year + (quarter-1)
    return f"(year({col}) * 4 + quarter({col}) - 1)"


def _nrr_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    qn = _qnum(dialect, "o_orderdate")
    ql = _quarter(dialect, "o_orderdate")
    return f"""
WITH per_cq AS (
    SELECT o_custkey, {qn} AS qn, max({ql}) AS q_label,
           cast(sum(cast(floor(100.0 * o_totalprice) AS bigint)) AS bigint)
               AS rev_cents
    FROM orders GROUP BY o_custkey, {qn}
),
quarters AS (SELECT DISTINCT qn, q_label FROM per_cq),
-- base-quarter customers joined to their (possibly absent) next quarter
paired AS (
    SELECT b.qn AS base_qn, b.q_label AS base_q,
           b.rev_cents AS base_cents,
           coalesce(n.rev_cents, 0) AS next_cents
    FROM per_cq b
    LEFT JOIN per_cq n
        ON n.o_custkey = b.o_custkey AND n.qn = b.qn + 1
),
rolled AS (
    SELECT base_qn, base_q,
           cast(count(*) AS bigint) AS base_customers,
           cast(sum(CASE WHEN next_cents > 0 THEN 1 ELSE 0 END) AS bigint)
               AS retained_customers,
           cast(sum(base_cents) AS bigint) AS base_cents,
           cast(sum(next_cents) AS bigint) AS next_cents,
           -- gross retention caps each customer at prior spend
           cast(sum(least(next_cents, base_cents)) AS bigint)
               AS retained_cents,
           cast(sum(CASE WHEN next_cents > base_cents
                    THEN next_cents - base_cents ELSE 0 END) AS bigint)
               AS expansion_cents
    FROM paired GROUP BY base_qn, base_q
),
-- the last quarter has no successor to measure against
bounded AS (
    SELECT r.* FROM rolled r
    WHERE r.base_qn < (SELECT max(qn) FROM quarters)
)
SELECT base_q, base_customers, retained_customers,
       base_cents, next_cents,
       (next_cents * 1000000) {idiv} base_cents AS nrr_micro,
       (retained_cents * 1000000) {idiv} base_cents AS grr_micro,
       (expansion_cents * 1000000) {idiv} base_cents AS expansion_micro,
       (retained_customers * 1000000) {idiv} base_customers
           AS logo_retention_micro
FROM bounded
ORDER BY base_q
"""


@register("net_revenue_retention", oracle=_nrr_sql("duckdb"))
def net_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarterly NRR/GRR: for each base quarter, its paying customers'
    next-quarter spend as a fraction of their base spend — net (with
    expansion), gross (capped at prior spend), the expansion component,
    and logo retention, all in exact micro ratios over integer cents.
    One grouped pass to (customer, quarter), one self-join on
    (customer, q+1) — both shuffle on the customer key, which Catalyst
    reuses — then a quarter-level rollup. The base/next distinction is
    what separates this from events_cohort_retention (activity matrix)
    and customer_ltv_cohort (cumulative value): NRR measures the SAME
    cohort's revenue trajectory one period forward, the number a SaaS
    board deck quotes. Companion: orders_mom_growth (aggregate trend)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_nrr_sql("spark"))
