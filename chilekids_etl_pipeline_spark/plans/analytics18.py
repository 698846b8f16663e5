"""Analytics operators, batch 18 (round 7): grouped price elasticity,
forecast backtesting, zone-map skip-rate advisor, and propensity
calibration.

Public recipes as declarative Spark plans:

- Grouped OLS price elasticity (econometrics textbook): per part type,
  regress line-item quantity on discount — the demand-response read a
  pricing team runs per category.
- Rolling-origin forecast backtest (standard forecasting hygiene,
  Hyndman & Athanasopoulos): fit the trend on days ≤ cutoff, score the
  next 30 days with MAPE and signed bias — the evaluation companion to
  q6_forecast_revenue.
- Zone-map skip-rate advisor (Moerkotte 1998 small materialized
  aggregates; every lakehouse file-skipping design): per-file min/max
  under the NATURAL layout vs a SHIPDATE-SORTED layout, and the file
  skip rate each gives a monthly date predicate — the measured argument
  for sort-on-write.
- Calibration / ECE (Guo et al. 2017): decile reliability table of a
  behavioral propensity score against observed purchase outcomes.

Dual-dialect SQL templates; regression accumulators are exact
decimal(38,0) (overflow-proof at 10^12-row groups), every other
cross-row float is floor-quantized to micros first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


_DEC = "decimal(38, 0)"


def _epoch_day(dialect: str, col: str) -> str:
    if dialect == "spark":
        return f"cast(floor(unix_timestamp({col}) / 86400.0) AS bigint)"
    return f"cast(floor(epoch({col}) / 86400.0) AS bigint)"


# ---------------------------------------------------------------------------
# grouped price elasticity


def _elasticity_sql(dialect: str) -> str:
    d = _DEC
    return f"""
WITH pts AS (
    -- x: discount in exact basis points; y: quantity (integer units)
    SELECT p.p_type,
           cast(floor(10000.0 * l.l_discount + 0.5) AS bigint) AS x,
           cast(floor(l.l_quantity + 0.5) AS bigint) AS y
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
sums AS (
    SELECT p_type, cast(count(*) AS bigint) AS n,
           cast(sum(cast(x AS {d})) AS {d}) AS sx,
           cast(sum(cast(y AS {d})) AS {d}) AS sy,
           cast(sum(cast(x AS {d}) * cast(x AS {d})) AS {d}) AS sxx,
           cast(sum(cast(y AS {d}) * cast(y AS {d})) AS {d}) AS syy,
           cast(sum(cast(x AS {d}) * cast(y AS {d})) AS {d}) AS sxy
    FROM pts GROUP BY p_type
)
SELECT p_type, n,
       -- slope: units of quantity per basis point of discount, micros;
       -- numerator/denominator are EXACT decimals, one double division
       cast(floor(1000000.0 *
            cast(cast(n AS {d}) * sxy - sx * sy AS double)
            / cast(cast(n AS {d}) * sxx - sx * sx AS double)) AS bigint)
           AS slope_micro,
       cast(floor(1000000.0 *
            (cast(sy AS double) / n
             - cast(cast(n AS {d}) * sxy - sx * sy AS double)
               / cast(cast(n AS {d}) * sxx - sx * sx AS double)
               * (cast(sx AS double) / n))) AS bigint) AS intercept_micro,
       cast(floor(1000000.0 *
            cast(cast(n AS {d}) * sxy - sx * sy AS double)
            / sqrt(cast(cast(n AS {d}) * sxx - sx * sx AS double)
                   * cast(cast(n AS {d}) * syy - sy * sy AS double)))
            AS bigint) AS corr_micro
FROM sums
ORDER BY p_type
"""


@register("grouped_ols_elasticity", oracle=_elasticity_sql("duckdb"))
def grouped_ols_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part-type price elasticity: OLS of line-item quantity on
    discount (basis points), with intercept and Pearson correlation —
    the demand-response table a pricing review reads per category. One
    grouped pass accumulates the five regression sums in decimal(38,0)
    (exact, order-proof, no overflow at 10^12-row groups — bigint
    crosses 2^63 near 10^9 rows of x·y products); each group's closed
    form is one double division at the end. The join side (part) is a
    dimension — broadcast, no fact shuffle. Companions: theil_sen_trend
    (robust alternative shape), q6_forecast_revenue (time trend),
    categorical_mi (non-linear association screen)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_elasticity_sql("spark"))


# ---------------------------------------------------------------------------
# rolling-origin forecast backtest


_BT_TRAIN_DAYS = 180
_BT_TEST_DAYS = 30


def _backtest_sql(dialect: str) -> str:
    d = _DEC
    idiv = _idiv(dialect)
    day = _epoch_day(dialect, "o_orderdate")
    return f"""
WITH daily AS (
    SELECT {day} AS day,
           cast(sum(cast(floor(100.0 * o_totalprice) AS bigint)) AS bigint)
               AS rev_cents
    FROM orders GROUP BY 1
),
cutoff AS (
    SELECT cast(max(day) AS bigint) - {_BT_TEST_DAYS} AS cut FROM daily
),
train AS (
    SELECT d.day - c.cut AS t, d.rev_cents
    FROM daily d CROSS JOIN cutoff c
    WHERE d.day <= c.cut AND d.day > c.cut - {_BT_TRAIN_DAYS}
),
fit AS (
    -- exact decimal normal equations; slope/intercept leave as doubles
    SELECT cast(count(*) AS bigint) AS n_train,
           cast(cast(count(*) AS {d})
                * sum(cast(t AS {d}) * cast(rev_cents AS {d}))
                - sum(cast(t AS {d})) * sum(cast(rev_cents AS {d}))
                AS double)
           / cast(cast(count(*) AS {d})
                  * sum(cast(t AS {d}) * cast(t AS {d}))
                  - sum(cast(t AS {d})) * sum(cast(t AS {d}))
                  AS double) AS slope,
           cast(sum(cast(rev_cents AS {d})) AS double) / count(*)
               AS mean_y,
           cast(sum(cast(t AS {d})) AS double) / count(*) AS mean_t
    FROM train
),
test AS (
    SELECT d.day - c.cut AS t, d.rev_cents
    FROM daily d CROSS JOIN cutoff c
    WHERE d.day > c.cut
),
scored AS (
    -- per-day percentage errors floor-quantized to micros BEFORE the
    -- mean: the backtest summary is exact-bigint
    SELECT t,
           cast(floor(1000000.0 *
                abs((f.mean_y + f.slope * (t - f.mean_t)) - rev_cents)
                / rev_cents) AS bigint) AS ape_micro,
           cast(floor(1000000.0 *
                ((f.mean_y + f.slope * (t - f.mean_t)) - rev_cents)
                / rev_cents) AS bigint) AS pe_micro
    FROM test CROSS JOIN fit f
)
SELECT f.n_train, cast(count(*) AS bigint) AS n_test,
       cast(floor(1000000.0 * f.slope) AS bigint) AS slope_micro,
       cast(sum(s.ape_micro) AS bigint) {idiv} count(*) AS mape_micro,
       cast(sum(s.pe_micro) AS bigint) {idiv} count(*) AS bias_micro,
       cast(max(s.ape_micro) AS bigint) AS worst_day_ape_micro
FROM scored s CROSS JOIN fit f
GROUP BY f.n_train, f.slope
"""


@register("forecast_backtest_mape", oracle=_backtest_sql("duckdb"))
def forecast_backtest_mape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin backtest of the linear revenue forecast: fit OLS
    on the 180 days before the holdout cutoff (exact decimal normal
    equations), predict the final 30 days, report MAPE, signed bias,
    and the worst day — the evaluation a forecast needs before anyone
    trusts q6_forecast_revenue's line. Everything past the one grouped
    day-aggregation (map-side combinable) runs on the bounded day
    series; per-day percentage errors are floor-quantized to micros
    before the mean, so the summary is exact. Companions:
    q6_forecast_revenue (the forecast), theil_sen_trend (robust slope),
    ewma_daily_revenue (smoothing)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_backtest_sql("spark"))


# ---------------------------------------------------------------------------
# zone-map skip-rate advisor


_ZM_ROWS_PER_FILE = 1000
_ZM_NATURAL_KEYS_PER_FILE = 256  # l_orderkey span per natural "file"


def _zonemap_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    day = _epoch_day(dialect, "l_shipdate")
    if dialect == "spark":
        month = "cast(date_format(l_shipdate, 'yyyy-MM') AS string)"
    else:
        month = "strftime(l_shipdate, '%Y-%m')"
    return f"""
WITH rows_t AS (
    SELECT l_orderkey, {day} AS ship_day, {month} AS ship_month
    FROM lineitem
),
-- NATURAL layout: files follow insertion order (orderkey ranges)
nat_files AS (
    SELECT (l_orderkey {idiv} {_ZM_NATURAL_KEYS_PER_FILE}) AS file_id,
           min(ship_day) AS zmin, max(ship_day) AS zmax
    FROM rows_t GROUP BY 1
),
-- SORTED layout: files are contiguous ship_day ranges; a day's rows
-- inherit the file where the day's cumulative range begins (day-level
-- zone maps from the bounded day histogram, no global row sort)
day_hist AS (
    SELECT ship_day, cast(count(*) AS bigint) AS c
    FROM rows_t GROUP BY ship_day
),
day_files AS (
    SELECT ship_day,
           cast(coalesce(sum(c) OVER (ORDER BY ship_day
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING), 0)
                AS bigint) {idiv} {_ZM_ROWS_PER_FILE} AS file_id
    FROM day_hist
),
sort_files AS (
    SELECT file_id, min(ship_day) AS zmin, max(ship_day) AS zmax
    FROM day_files GROUP BY file_id
),
-- the predicate grid: one [min_day, max_day] range per observed month
months AS (
    SELECT ship_month, min(ship_day) AS lo, max(ship_day) AS hi
    FROM rows_t GROUP BY ship_month
),
nat_touch AS (
    SELECT m.ship_month,
           cast(count(*) AS bigint) AS touched
    FROM months m JOIN nat_files f
        ON f.zmax >= m.lo AND f.zmin <= m.hi
    GROUP BY m.ship_month
),
sort_touch AS (
    SELECT m.ship_month,
           cast(count(*) AS bigint) AS touched
    FROM months m JOIN sort_files f
        ON f.zmax >= m.lo AND f.zmin <= m.hi
    GROUP BY m.ship_month
),
tot AS (
    SELECT (SELECT cast(count(*) AS bigint) FROM nat_files) AS n_nat,
           (SELECT cast(count(*) AS bigint) FROM sort_files) AS n_sort
)
SELECT m.ship_month, t.n_nat AS files_natural, t.n_sort AS files_sorted,
       nt.touched AS touched_natural, st.touched AS touched_sorted,
       ((t.n_nat - nt.touched) * 1000000) {idiv} t.n_nat
           AS skip_natural_micro,
       ((t.n_sort - st.touched) * 1000000) {idiv} t.n_sort
           AS skip_sorted_micro
FROM months m
JOIN nat_touch nt ON m.ship_month = nt.ship_month
JOIN sort_touch st ON m.ship_month = st.ship_month
CROSS JOIN tot t
ORDER BY m.ship_month
"""


@register("zonemap_skip_rate", oracle=_zonemap_sql("duckdb"))
def zonemap_skip_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map file-skipping advisor: per-file min/max ship_day under
    the NATURAL (insertion-order) layout vs a SHIPDATE-SORTED layout,
    and the file skip rate each layout gives every monthly predicate —
    the measured case for sort-on-write that a lakehouse table-layout
    review runs before choosing a sort key. Both layouts derive from
    GROUPED scans (orderkey ranges; the bounded per-day histogram with a
    cumulative window over days) — no global row sort anywhere, so the
    advisor itself is metadata-scale at 100 TB. The range join runs
    months × files on the file summary (thousands of rows).
    Companions: zorder_layout (multi-column clustering),
    range_partition_planner (boundary choice), small_file_compaction_plan
    (file sizing), partition_prune_estimate (partition-level pruning)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_zonemap_sql("spark"))


# ---------------------------------------------------------------------------
# propensity calibration (reliability table + ECE)


_CAL_K = 20  # shrinkage pseudo-count


def _calibration_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    return f"""
WITH per_user AS (
    SELECT user_id,
           cast(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                AS bigint) AS views,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS bought
    FROM events GROUP BY user_id
),
scored AS (
    -- deterministic propensity score: shrunken view share s = v/(v+k),
    -- quantized to micros; decile bin from the integer score
    SELECT user_id, bought,
           cast(floor(1000000.0 * views
                      / (views + {_CAL_K})) AS bigint) AS score_micro
    FROM per_user
),
bins AS (
    SELECT (score_micro {idiv} 100000) AS bin,
           cast(count(*) AS bigint) AS n,
           cast(sum(score_micro) AS bigint) AS sum_score_micro,
           cast(sum(bought) AS bigint) AS n_pos
    FROM scored GROUP BY 1
),
tot AS (SELECT cast(sum(n) AS bigint) AS n_total FROM bins)
SELECT b.bin, b.n, b.n_pos,
       b.sum_score_micro {idiv} b.n AS mean_score_micro,
       (b.n_pos * 1000000) {idiv} b.n AS obs_rate_micro,
       abs(b.sum_score_micro {idiv} b.n
           - (b.n_pos * 1000000) {idiv} b.n) AS gap_micro,
       -- this bin's contribution to ECE = (n_b/N)·|gap_b|, in micros
       (b.n * abs(b.sum_score_micro {idiv} b.n
                  - (b.n_pos * 1000000) {idiv} b.n)) {idiv} t.n_total
           AS ece_contrib_micro
FROM bins b CROSS JOIN tot t
ORDER BY b.bin
"""


@register("purchase_propensity_calibration", oracle=_calibration_sql("duckdb"))
def purchase_propensity_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability table for a behavioral purchase-propensity score:
    users scored by shrunken view share v/(v+20), binned at 0.1 width,
    each bin reporting mean score vs observed purchase rate, the
    calibration gap, and its ECE contribution (Guo et al. 2017's
    expected calibration error, decomposed per bin so the total is one
    SUM over this output). Two grouped passes (events → user → bin),
    both map-side combinable; every rate is an exact micro integer. A
    well-calibrated score tracks the diagonal; the gap column is what a
    ranking-model review reads. Companions: decile_lift_table (ranking
    power), ab_test_conversion (uplift), conformal_threshold_calibration
    (coverage calibration)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_calibration_sql("spark"))
