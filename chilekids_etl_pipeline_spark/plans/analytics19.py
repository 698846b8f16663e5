"""Analytics operators, batch 19 (round 7): retention half-life fit,
seasonal decomposition, and reciprocal-rank fusion.

Public recipes as declarative Spark plans:

- Retention half-life (growth-analytics staple): pooled cohort
  retention by account age, exponential-decay fit on the log rates,
  half-life = ln2/|slope| — the single number a growth review quotes.
- Classical seasonal decomposition (Cleveland's STL ancestor;
  statsmodels `seasonal_decompose`): centered 7-day moving-average
  trend, day-of-week seasonal indices from the detrended series,
  residual magnitude per weekday — all in exact micro integers.
- Reciprocal-rank fusion (Cormack et al. 2009): fuse two top-k
  candidate lists (revenue rank, order-count rank) with
  score = Σ 1/(60+rank) — the standard zero-tuning list merger, done
  the way RRF is actually deployed: over bounded top-k lists, never a
  global full-table ranking.

Dual-dialect SQL templates; every cross-row sum is over exact integers
(micro/nano-quantized per row first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


def _epoch_day(dialect: str, col: str) -> str:
    if dialect == "spark":
        return f"cast(floor(unix_timestamp({col}) / 86400.0) AS bigint)"
    return f"cast(floor(epoch({col}) / 86400.0) AS bigint)"


# ---------------------------------------------------------------------------
# retention half-life


def _retention_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    day = _epoch_day(dialect, "ts")
    return f"""
WITH user_days AS (
    SELECT user_id, {day} {idiv} 7 AS week
    FROM events GROUP BY user_id, 2
),
cohorts AS (
    SELECT user_id, min(week) AS cohort_week FROM user_days GROUP BY user_id
),
cohort_sizes AS (
    SELECT cohort_week, cast(count(*) AS bigint) AS cohort_n
    FROM cohorts GROUP BY cohort_week
),
max_week AS (SELECT max(week) AS mw FROM user_days),
-- pooled retention: for age a, eligible = users whose cohort could be
-- observed at age a; active = those actually seen at that age
actives AS (
    SELECT u.week - c.cohort_week AS age_weeks,
           cast(count(*) AS bigint) AS active_n
    FROM user_days u JOIN cohorts c ON u.user_id = c.user_id
    GROUP BY 1
),
eligibles AS (
    SELECT a.age_weeks,
           cast(sum(s.cohort_n) AS bigint) AS eligible_n
    FROM (SELECT DISTINCT age_weeks FROM actives) a
    JOIN cohort_sizes s CROSS JOIN max_week m
        ON s.cohort_week + a.age_weeks <= m.mw
    GROUP BY a.age_weeks
),
rates AS (
    SELECT e.age_weeks, e.eligible_n, a.active_n,
           (a.active_n * 1000000) {idiv} e.eligible_n AS rate_micro
    FROM eligibles e JOIN actives a ON e.age_weeks = a.age_weeks
),
fit AS (
    -- OLS of ln(rate) on age over the positive-age points (age 0 is 1.0
    -- by construction); the age table is bounded (product lifetime in
    -- weeks), so these sums are a handful of rows
    SELECT cast(count(*) AS bigint) AS n_pts,
           (count(*) * sum(age_weeks * ln(rate_micro / 1000000.0))
            - sum(age_weeks) * sum(ln(rate_micro / 1000000.0)))
           / (count(*) * sum(age_weeks * age_weeks)
              - sum(age_weeks) * sum(age_weeks)) AS slope
    FROM rates WHERE age_weeks >= 1 AND rate_micro > 0
)
SELECT r.age_weeks, r.eligible_n, r.active_n, r.rate_micro,
       f.n_pts AS fit_points,
       cast(floor(1000000.0 * f.slope) AS bigint) AS decay_slope_micro,
       CASE WHEN f.slope < 0
            THEN cast(floor(1000000.0 * (-0.6931471805599453 / f.slope))
                      AS bigint)
            ELSE NULL END AS halflife_weeks_micro
FROM rates r CROSS JOIN fit f
ORDER BY r.age_weeks
"""


@register("retention_halflife_fit", oracle=_retention_sql("duckdb"))
def retention_halflife_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pooled weekly retention by account age with an exponential-decay
    fit: rate(a) = active/eligible per age (censoring-aware — a cohort
    only counts as eligible at ages it could have been observed),
    ln-rate regressed on age, half-life = ln2/|slope| attached to every
    row. Three grouped passes over (user, week) — all map-side
    combinable; the fit runs on the bounded AGE table (product lifetime
    in weeks). Companions: events_cohort_retention (per-cohort matrix),
    customer_ltv_cohort (value dimension), survival_km_curve
    (non-parametric alternative), customer_churn_flag (point-in-time)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_retention_sql("spark"))


# ---------------------------------------------------------------------------
# seasonal decomposition


def _seasonal_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    day = _epoch_day(dialect, "o_orderdate")
    return f"""
WITH daily AS (
    SELECT {day} AS day,
           cast(sum(cast(floor(100.0 * o_totalprice) AS bigint)) AS bigint)
               AS rev_cents
    FROM orders GROUP BY 1
),
trended AS (
    -- centered 7-day MA trend in exact micro-cents ((sum*1e6) DIV 7);
    -- only days with a FULL window get a trend (classical decompose
    -- drops the edges)
    SELECT day, rev_cents,
           (cast(sum(rev_cents) OVER cw AS bigint) * 1000000) {idiv} 7
               AS trend_micro,
           cast(count(*) OVER cw AS bigint) AS w_n
    FROM daily
    WINDOW cw AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
detrended AS (
    -- exact micro-cents residual from the trend; dow 0..6 with day 0 a
    -- Thursday (epoch day 0 = 1970-01-01), engine-independent integers
    SELECT (day + 4) % 7 AS dow,
           rev_cents * 1000000 - trend_micro AS det_micro
    FROM trended WHERE w_n = 7
),
seasonal AS (
    SELECT dow, cast(count(*) AS bigint) AS n_days,
           cast(sum(det_micro) AS bigint) {idiv} count(*) AS seasonal_micro
    FROM detrended GROUP BY dow
)
SELECT d.dow, s.n_days, s.seasonal_micro,
       cast(sum(abs(d.det_micro - s.seasonal_micro)) AS bigint)
           {idiv} s.n_days AS mean_abs_resid_micro,
       cast(max(abs(d.det_micro - s.seasonal_micro)) AS bigint)
           AS max_abs_resid_micro
FROM detrended d JOIN seasonal s ON d.dow = s.dow
GROUP BY d.dow, s.n_days, s.seasonal_micro
ORDER BY d.dow
"""


@register("seasonal_decompose_daily", oracle=_seasonal_sql("duckdb"))
def seasonal_decompose_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily revenue:
    centered 7-day moving-average trend, day-of-week seasonal indices
    from the detrended series, and per-weekday residual magnitude — the
    trend/seasonal/residual split a revenue review reads before calling
    a dip 'seasonal'. Everything past the one grouped day-aggregation
    runs on the bounded day series, and the whole pipeline is exact
    integer micro-cents (trend = (7-day sum·10⁶) DIV 7, so even the MA
    is a bigint). Companions: orders_seasonality_dow (raw dow means),
    ewma_daily_revenue (smoothing), anomaly_mad_robust (outliers),
    forecast_backtest_mape (trend evaluation)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_seasonal_sql("spark"))


# ---------------------------------------------------------------------------
# reciprocal-rank fusion


_RRF_K = 60
_RRF_LIST = 1000
_RRF_OUT = 20


def _rrf_sql(dialect: str) -> str:
    return f"""
WITH per_cust AS (
    SELECT o_custkey,
           cast(sum(cast(floor(100.0 * o_totalprice) AS bigint)) AS bigint)
               AS rev_cents,
           cast(count(*) AS bigint) AS n_orders
    FROM orders GROUP BY o_custkey
),
-- two bounded top-k candidate lists (rank within the LIMITed list,
-- never a full-table ranking)
by_rev AS (
    SELECT o_custkey,
           row_number() OVER (ORDER BY rev_cents DESC, o_custkey) AS r
    FROM (SELECT o_custkey, rev_cents FROM per_cust
          ORDER BY rev_cents DESC, o_custkey LIMIT {_RRF_LIST}) t
),
by_cnt AS (
    SELECT o_custkey,
           row_number() OVER (ORDER BY n_orders DESC, o_custkey) AS r
    FROM (SELECT o_custkey, n_orders FROM per_cust
          ORDER BY n_orders DESC, o_custkey LIMIT {_RRF_LIST}) t
),
fused AS (
    -- RRF in exact nanos: floor(1e9/(k+r)) per list membership
    SELECT coalesce(a.o_custkey, b.o_custkey) AS o_custkey,
           a.r AS rank_rev, b.r AS rank_cnt,
           coalesce(cast(floor(1000000000.0 / ({_RRF_K} + a.r)) AS bigint),
                    0)
           + coalesce(cast(floor(1000000000.0 / ({_RRF_K} + b.r)) AS bigint),
                      0) AS rrf_nano
    FROM by_rev a FULL OUTER JOIN by_cnt b ON a.o_custkey = b.o_custkey
)
SELECT o_custkey, rank_rev, rank_cnt, rrf_nano,
       row_number() OVER (ORDER BY rrf_nano DESC, o_custkey) AS fused_rank
FROM fused
ORDER BY fused_rank
LIMIT {_RRF_OUT}
"""


@register("rrf_rank_fusion", oracle=_rrf_sql("duckdb"))
def rrf_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two customer rankings (revenue,
    order count): score = Σ 1/(60+rank) over the lists a customer
    appears in, computed in exact nano integers — the zero-tuning list
    merger used to fuse lexical and vector retrieval. Deployed shape:
    each input list is a BOUNDED top-1000 (Spark plans ORDER BY+LIMIT
    as TakeOrderedAndProject — per-partition top-k then a merge, no
    global sort), ranks are assigned within the 1000-row lists, and the
    fusion is a full outer join of two metadata-scale lists.
    Companions: revenue_topk_threshold (single-metric top-k at scale),
    weighted_sample_topk, item_similarity_topk (the vector side)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_rrf_sql("spark"))
