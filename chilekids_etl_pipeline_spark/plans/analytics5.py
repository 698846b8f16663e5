"""Extended analytics, batch 5: market-basket co-occurrence with lift,
RFM customer segmentation, daily order-backlog via interval event
cumulation, and funnel time-to-convert distribution.

Dual-dialect SQL templates like the rest of the catalog (Spark plan and
DuckDB oracle from one string). Must not import other plan modules —
registry insertion order is the external gate's sampling window
(tests/test_registry_order.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# market-basket brand co-occurrence + lift

_BASKET_MIN_COOC = 2


def _basket_sql(dialect: str) -> str:
    return f"""
WITH items AS (
    SELECT DISTINCT l_orderkey, p_brand
    FROM lineitem JOIN part ON l_partkey = p_partkey
),
norders AS (SELECT cast(count(DISTINCT l_orderkey) AS bigint) AS n FROM items),
brand_cnt AS (
    SELECT p_brand, cast(count(*) AS bigint) AS n_orders
    FROM items GROUP BY p_brand
),
pairs AS (
    SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
           cast(count(*) AS bigint) AS n_cooc
    FROM items a
    JOIN items b ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
    GROUP BY a.p_brand, b.p_brand
)
SELECT brand_a, brand_b, n_cooc,
       ca.n_orders AS n_a, cb.n_orders AS n_b,
       n_cooc * norders.n / cast(ca.n_orders * cb.n_orders AS double) AS lift
FROM pairs
JOIN brand_cnt ca ON ca.p_brand = brand_a
JOIN brand_cnt cb ON cb.p_brand = brand_b
CROSS JOIN norders
WHERE n_cooc >= {_BASKET_MIN_COOC}
"""


@register("market_basket_pairs", oracle=_basket_sql("duckdb"))
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis: brand pairs co-purchased within an order,
    with lift = P(a,b) / (P(a)·P(b)) — the association-rule primitive.
    The pair generation is a self-join ON THE ORDER KEY, so pairwise work
    is bounded by per-order basket size (≤ 7 lineitems in this schema),
    never corpus-wide; the part dimension joins broadcast; lift's only
    division happens once per output row over exact integer counts. At
    100 TB the same plan holds — the quadratic term rides the basket
    size, not the table size."""
    for t in ("lineitem", "part"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_basket_sql("spark"))


# ---------------------------------------------------------------------------
# RFM segmentation

_RFM_FRACS = "0.25, 0.5, 0.75"


def _rfm_sql(dialect: str) -> str:
    if dialect == "spark":
        q = "percentile({c}, array({f}))"
        nbelow = "cast(size(filter({t}, x -> x < {v})) AS int) + 1"
        days = "datediff(ref_date, last_date)"
    else:
        q = "quantile_cont({c}, [{f}])"
        nbelow = "cast(len(list_filter({t}, x -> x < {v})) AS int) + 1"
        days = "datediff('day', last_date, ref_date)"
    return f"""
WITH base AS (
    SELECT o_custkey,
           cast(max(o_orderdate) AS date) AS last_date,
           cast(count(*) AS bigint) AS frequency,
           cast(sum(cast(o_totalprice AS decimal(18, 2))) AS double) AS monetary
    FROM orders GROUP BY o_custkey
),
ref AS (SELECT cast(max(o_orderdate) AS date) AS ref_date FROM orders),
rfm AS (
    SELECT o_custkey, cast({days} AS bigint) AS recency_days,
           frequency, monetary
    FROM base CROSS JOIN ref
),
th AS (
    SELECT {q.format(c='recency_days', f=_RFM_FRACS)} AS tr,
           {q.format(c='frequency', f=_RFM_FRACS)} AS tf,
           {q.format(c='monetary', f=_RFM_FRACS)} AS tm
    FROM rfm
)
SELECT o_custkey, recency_days, frequency, monetary,
       5 - ({nbelow.format(t='tr', v='recency_days')}) AS r_score,
       {nbelow.format(t='tf', v='frequency')} AS f_score,
       {nbelow.format(t='tm', v='monetary')} AS m_score,
       CASE WHEN 5 - ({nbelow.format(t='tr', v='recency_days')}) >= 3
                 AND {nbelow.format(t='tf', v='frequency')} >= 3
            THEN 'loyal'
            WHEN 5 - ({nbelow.format(t='tr', v='recency_days')}) <= 2
                 AND {nbelow.format(t='tm', v='monetary')} >= 3
            THEN 'at_risk_high_value'
            WHEN 5 - ({nbelow.format(t='tr', v='recency_days')}) >= 3
            THEN 'recent'
            ELSE 'hibernating' END AS segment
FROM rfm CROSS JOIN th
"""


@register("rfm_segmentation", oracle=_rfm_sql("duckdb"))
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency/frequency/monetary) customer segmentation: per
    customer, days since last order, order count, exact decimal-summed
    spend — each scored into quartiles. NOT an ntile global sort: the
    three quartile-threshold arrays reduce to ONE broadcast row (the
    length_curriculum_buckets pattern) and every customer scores with a
    strictly-less count against them, so the only corpus shuffle is the
    per-customer groupBy. Recency inverts (recent = high score); the
    segment label is the standard 2-axis read of the scores."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_rfm_sql("spark"))


# ---------------------------------------------------------------------------
# daily open-order backlog

_BACKLOG_ORACLE_TEMPLATE = """
WITH spans AS (
    SELECT o_orderkey,
           cast(min(o_orderdate) AS date) AS opened,
           cast(max(l_shipdate) AS date) AS closed
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
),
deltas AS (
    SELECT opened AS d, 1 AS delta FROM spans
    UNION ALL
    SELECT {next_day}, -1 FROM spans
),
daily AS (
    SELECT d, cast(sum(delta) AS bigint) AS net FROM deltas GROUP BY d
)
SELECT d, net,
       cast(sum(net) OVER (ORDER BY d
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint)
           AS open_orders
FROM daily
"""


def _backlog_sql(dialect: str) -> str:
    next_day = "date_add(closed, 1)" if dialect == "spark" else "closed + 1"
    return _BACKLOG_ORACLE_TEMPLATE.format(next_day=next_day)


@register("order_backlog_daily", oracle=_backlog_sql("duckdb"))
def order_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily open-order backlog (orders placed but not yet fully shipped):
    each order's [orderdate, last shipdate] interval becomes a +1/-1
    event pair, summed per day, then cumulated. This event-izing is the
    scale-correct way to count concurrent intervals — no per-day × per-
    order range join, and the cumulative window runs over the DATE
    aggregate (bounded by the calendar, ~2.4k rows here), not the fact
    table. Orders without lineitems (none in this schema) would be open-
    ended and are excluded by the inner join."""
    for t in ("orders", "lineitem"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_backlog_sql("spark"))


# ---------------------------------------------------------------------------
# funnel time-to-convert

_CONVERT_MAX_DAY_BUCKET = 7


def _convert_sql(dialect: str) -> str:
    # microsecond-integer epochs: DuckDB's epoch() keeps fractional
    # seconds (a DOUBLE) while Spark's unix_timestamp() floors — the
    # integer-microsecond forms are exact and identical in both engines
    epoch = "unix_micros({c})" if dialect == "spark" else "epoch_us({c})"
    op = "DIV" if dialect == "spark" else "//"
    lat = (
        f"(({epoch.format(c='tp')} - {epoch.format(c='t0')}) {op} 1000000)"
    )
    day = f"least(({lat}) {op} 86400, {_CONVERT_MAX_DAY_BUCKET})"
    return f"""
WITH first_view AS (
    SELECT user_id, min(ts) AS t0 FROM events
    WHERE event_type = 'view' GROUP BY user_id
),
first_purchase AS (
    SELECT e.user_id, min(e.ts) AS tp
    FROM events e JOIN first_view v ON e.user_id = v.user_id
    WHERE e.event_type = 'purchase' AND e.ts >= v.t0
    GROUP BY e.user_id
),
latency AS (
    SELECT v.user_id, cast({lat} AS bigint) AS latency_sec,
           cast({day} AS bigint) AS day_bucket
    FROM first_view v JOIN first_purchase p ON v.user_id = p.user_id
)
SELECT day_bucket,
       cast(count(*) AS bigint) AS n_users,
       cast(sum(latency_sec) AS bigint) AS total_latency_sec,
       {_intdiv_sum(dialect)} AS avg_latency_sec
FROM latency
GROUP BY day_bucket
"""


def _intdiv_sum(dialect: str) -> str:
    op = "DIV" if dialect == "spark" else "//"
    return f"cast(sum(latency_sec) {op} count(*) AS bigint)"


@register("funnel_time_conversion", oracle=_convert_sql("duckdb"))
def funnel_time_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency: per user, the time from first 'view' to the first
    'purchase' at-or-after it, bucketed into days (capped at a week) —
    the time-to-convert distribution that sits beside the events_funnel
    conversion counts. Two keyed min-aggregations and one equi-join on
    user_id (the purchase side is pre-filtered to funnel entrants);
    latency sums in exact integer seconds, averaged by integer division
    — fully portable, no floating aggregation."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_convert_sql("spark"))
