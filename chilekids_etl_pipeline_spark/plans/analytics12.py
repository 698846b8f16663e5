"""Extended analytics, batch 12 (round 7): decile lift/gains analysis,
zone-map partition-prune estimation, and ABC (Pareto) classification.

Dual-dialect templates; every comparison-relevant quantity is integer
(cents, counts, micro-rates) so the engines hash identically. The two
ranking operators reuse the distribution-table trick (groupBy the value,
window over the AGGREGATE) instead of a per-row global sort — rank work
scales with distinct values, not rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


# ---------------------------------------------------------------------------
# decile lift table


def _lift_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    return f"""
WITH cust AS (
    SELECT o_custkey,
           cast(sum(cast(round(o_totalprice * 100, 0) AS bigint)) AS bigint)
               AS spend_cents,
           cast(max(CASE WHEN o_orderpriority = '1-URGENT'
                         THEN 1 ELSE 0 END) AS int) AS converted
    FROM orders GROUP BY o_custkey
),
-- distribution table: one row per distinct spend value. The decile rank
-- windows over this AGGREGATE (distinct values), never the customer
-- rows — the same two-phase shape as ccnet's buckets; ties share a
-- decile by construction, so the split is deterministic in both engines
dist AS (
    SELECT spend_cents, cast(count(*) AS bigint) AS n_cust,
           cast(sum(converted) AS bigint) AS n_conv
    FROM cust GROUP BY spend_cents
),
ranked AS (
    SELECT spend_cents, n_cust, n_conv,
           coalesce(sum(n_cust) OVER (ORDER BY spend_cents DESC
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING), 0) AS cum_before,
           sum(n_cust) OVER () AS n_total,
           sum(n_conv) OVER () AS conv_total
    FROM dist
),
deciled AS (
    SELECT cast((cum_before * 10) {idiv} n_total AS int) AS decile,
           n_cust, n_conv, n_total, conv_total,
           spend_cents
    FROM ranked
)
SELECT decile,
       cast(sum(n_cust) AS bigint) AS n_customers,
       cast(sum(n_conv) AS bigint) AS n_converted,
       min(spend_cents) AS spend_lo_cents,
       max(spend_cents) AS spend_hi_cents,
       -- lift vs base rate, integer micros: (rate_d / rate_all) * 1e6
       cast((sum(n_conv) * max(n_total) * 1000000)
            {idiv} (sum(n_cust) * max(conv_total)) AS bigint)
           AS lift_micro,
       -- gains: cumulative share of all conversions captured by the
       -- top deciles, in micros
       cast((sum(sum(n_conv)) OVER (ORDER BY decile
                                    ROWS UNBOUNDED PRECEDING) * 1000000)
            {idiv} max(conv_total) AS bigint) AS cum_gain_micro
FROM deciled
GROUP BY decile
"""


@register("decile_lift_table", oracle=_lift_sql("duckdb"))
def decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift/gains table — the model-evaluation staple: customers
    ranked by spend into deciles (0 = highest), per-decile conversion
    lift vs the base rate and cumulative gains, all in exact integer
    micros. Decile assignment windows over the spend DISTRIBUTION
    (distinct values with counts), not the customer rows, so the only
    per-row work is one mergeable groupBy — the global-sort-free ranking
    pattern every 100 TB scoring pipeline needs. Conversion here =
    customer has a 1-URGENT order; in production the score column is a
    model output and the outcome any label."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_lift_sql("spark"))


# ---------------------------------------------------------------------------
# zone-map partition-prune estimation

# candidate predicates over l_quantity (lo, hi): the zone column is NOT
# the partition key, so pruning power comes entirely from per-partition
# min/max stats — exactly what a lakehouse zone map gives you
_PRUNE_PREDICATES = ((1, 10), (25, 30), (45, 50), (60, 99))


def _prune_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    month = (
        "date_format(l_shipdate, 'yyyy-MM')" if dialect == "spark"
        else "strftime(l_shipdate, '%Y-%m')"
    )
    preds = " UNION ALL ".join(
        f"SELECT {i} AS pred_id, {lo} AS lo, {hi} AS hi"
        for i, (lo, hi) in enumerate(_PRUNE_PREDICATES)
    )
    return f"""
WITH zones AS (
    -- per-partition zone map: row count + min/max of the predicate
    -- column. ONE scan builds stats for every partition (mergeable
    -- min/max/count partials) — this is the planning-time metadata a
    -- real table format stores in its manifests.
    SELECT {month} AS part,
           cast(count(*) AS bigint) AS n_rows,
           min(l_quantity) AS q_min,
           max(l_quantity) AS q_max
    FROM lineitem GROUP BY {month}
),
preds AS ({preds}),
eval AS (
    SELECT p.pred_id, p.lo, p.hi, z.part, z.n_rows,
           CASE WHEN z.q_max < p.lo OR z.q_min > p.hi
                THEN 1 ELSE 0 END AS pruned
    FROM preds p CROSS JOIN zones z
)
SELECT pred_id, lo, hi,
       cast(count(*) AS bigint) AS n_partitions,
       cast(sum(pruned) AS bigint) AS n_pruned,
       cast(sum(CASE WHEN pruned = 0 THEN n_rows ELSE 0 END) AS bigint)
           AS rows_scanned,
       cast(sum(n_rows) AS bigint) AS rows_total,
       cast((sum(CASE WHEN pruned = 0 THEN n_rows ELSE 0 END) * 1000000)
            {idiv} sum(n_rows) AS bigint) AS scan_frac_micro
FROM eval
GROUP BY pred_id, lo, hi
"""


@register("partition_prune_estimate", oracle=_prune_sql("duckdb"))
def partition_prune_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map prune estimator — the planning query behind choosing a
    layout: build per-partition (month) min/max/count stats for a
    non-partition column in one scan, then evaluate candidate predicate
    ranges against them, reporting partitions pruned and the exact scan
    fraction in micros. This is how you quantify, BEFORE rewriting
    100 TB, whether a zorder_layout/range_partition_planner layout will
    actually let the format skip files for your workload's predicates.
    The stats table is partition-count-sized (metadata), so the
    predicate sweep costs nothing at any data scale."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(_prune_sql("spark"))


# ---------------------------------------------------------------------------
# ABC (Pareto) classification


def _abc_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    return f"""
WITH part_rev AS (
    SELECT l_partkey,
           cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100, 0)
                         AS bigint)) AS bigint) AS rev_cents
    FROM lineitem GROUP BY l_partkey
),
dist AS (
    SELECT rev_cents, cast(count(*) AS bigint) AS n_parts
    FROM part_rev GROUP BY rev_cents
),
ranked AS (
    SELECT rev_cents, n_parts,
           cast(rev_cents * n_parts AS bigint) AS value_rev,
           coalesce(sum(rev_cents * n_parts)
                    OVER (ORDER BY rev_cents DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS rev_before,
           sum(rev_cents * n_parts) OVER () AS rev_total
    FROM dist
),
classed AS (
    -- class boundaries on the revenue share BEFORE the value bucket:
    -- A = first 80% of revenue, B = next 15%, C = the tail. Classifying
    -- on the aggregate distribution keeps ties deterministic.
    SELECT CASE WHEN rev_before * 100 < rev_total * 80 THEN 'A'
                WHEN rev_before * 100 < rev_total * 95 THEN 'B'
                ELSE 'C' END AS abc_class,
           n_parts, value_rev
    FROM ranked
)
SELECT abc_class,
       cast(sum(n_parts) AS bigint) AS n_parts,
       cast(sum(value_rev) AS bigint) AS rev_cents,
       -- class_cents * 1e6 crosses 2^63 once corpus revenue passes
       -- ~9e12 cents (seen at sf1): go through doubles instead — both
       -- sums sit far below 2^53 so the conversion is exact, and the
       -- one division + floor is IEEE-identical in both engines
       cast(floor(1000000.0 * cast(sum(value_rev) AS double)
                  / cast(max(t.rev_total) AS double)) AS bigint)
           AS rev_share_micro
FROM classed CROSS JOIN (SELECT max(rev_total) AS rev_total FROM ranked) t
GROUP BY abc_class
"""


@register("abc_pareto_class", oracle=_abc_sql("duckdb"))
def abc_pareto_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC / Pareto inventory classification: parts bucketed A/B/C by
    cumulative revenue share (80/95 boundaries), reporting part counts,
    revenue, and exact micro shares per class. Classification runs on
    the revenue DISTRIBUTION table (distinct values + counts) with one
    cumulative window over the aggregate — rows are touched exactly
    once by a mergeable groupBy, the global-sort-free shape that holds
    at any part-catalog size."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem"
    )
    return spark.sql(_abc_sql("spark"))
