"""Analytics operators, batch 17 (round 7): differentially-private
count release, l-diversity audit, Theil–Sen robust trend, and Gini
revenue concentration.

Public recipes as declarative Spark plans:

- Laplace-mechanism count release (Dwork et al. 2006): histogram counts
  plus Laplace(1/ε) noise. Noise is drawn from a DETERMINISTIC
  hash-uniform per group (inverse-CDF), so the release is reproducible
  and cross-engine identical — the pattern a governed release pipeline
  uses for replayable DP outputs (a production system would swap the
  hash for a sealed seed).
- l-diversity (Machanavalli et al. 2007): the k-anonymity companion —
  an equivalence class is exposed when its SENSITIVE attribute carries
  fewer than l distinct values, even if the class itself is large.
- Theil–Sen estimator (Sen 1968): median of pairwise slopes — robust
  daily-revenue trend vs the OLS line, over a bounded trailing window.
- Gini coefficient (textbook): per-segment revenue concentration from
  the rank-weighted sum identity G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ)/(n·Σ xᵢ).

Dual-dialect SQL templates. Exactness: per-row terms are quantized to
integer micros/cents before any cross-row sum; the Gini rank-weighted
sum uses decimal(38,0) accumulators (exact in both engines, no bigint
overflow at 10⁹-customer segments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


def _h32(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"cast(conv(substr(md5({expr}), 1, 8), 16, 10) AS bigint)"
    return f"cast(('0x' || substr(md5({expr}), 1, 8)) AS bigint)"


# ---------------------------------------------------------------------------
# Laplace-mechanism DP count release


_DP_EPS = "1.0"
_DP_SALT = "dp_r7"


def _dp_sql(dialect: str) -> str:
    h = _h32(dialect, f"concat(lang, '|', source, '|', '{_DP_SALT}')")
    return f"""
WITH counts AS (
    SELECT lang, source, cast(count(*) AS bigint) AS true_n
    FROM documents GROUP BY lang, source
),
drawn AS (
    -- hash-uniform on the exact micro grid [-0.499999, +0.499999]:
    -- u is a 6-decimal value, exactly representable, never ±0.5, so
    -- ln(1 - 2|u|) is finite and both engines evaluate the identical
    -- double
    SELECT lang, source, true_n,
           ({h} % 999999) - 499999 AS u_micro
    FROM counts
),
noised AS (
    -- inverse-CDF Laplace(b = 1/eps): sensitivity of a disjoint
    -- histogram is 1 added/removed row per cell
    SELECT lang, source, true_n, u_micro,
           cast(floor(1000000.0 * (
               -(1.0 / {_DP_EPS})
               * (CASE WHEN u_micro < 0 THEN -1.0 ELSE 1.0 END)
               * ln(1.0 - 2.0 * abs(u_micro / 1000000.0))
           )) AS bigint) AS noise_micro
    FROM drawn
)
SELECT lang, source, true_n, noise_micro,
       true_n * 1000000 + noise_micro AS released_micro,
       abs(noise_micro) AS abs_err_micro
FROM noised
ORDER BY lang, source
"""


@register("dp_laplace_counts", oracle=_dp_sql("duckdb"))
def dp_laplace_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private release of the (lang, source) document
    histogram: each cell gets Laplace(1/ε) noise (ε=1, sensitivity 1 for
    disjoint counts) drawn by inverse-CDF from a salted-hash uniform on
    the exact micro grid — reproducible, cross-engine identical, and
    never at the ±0.5 singularity by construction. One grouped scan
    (map-side combinable) plus per-group scalar math; the released table
    is |langs|×|sources| rows — metadata-scale at any corpus size.
    Companions: k_anonymity_check / l_diversity_check (re-identification
    risk), gdpr_erasure_audit (deletion verification)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_dp_sql("spark"))


# ---------------------------------------------------------------------------
# l-diversity audit


_L_GRID = (2, 3, 5)


def _ldiv_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    ls = ", ".join(str(x) for x in _L_GRID)
    l_rows = (
        f"LATERAL VIEW explode(array({ls})) ll AS l"
        if dialect == "spark"
        else f", LATERAL (SELECT unnest([{ls}]) AS l) ll"
    )
    return f"""
WITH joined AS (
    SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
classes AS (
    -- one grouped pass: class size + distinct sensitive values (the
    -- class's l); both partial-aggregable
    SELECT c_nationkey, c_mktsegment,
           cast(count(*) AS bigint) AS class_rows,
           cast(count(DISTINCT o_orderpriority) AS bigint) AS l_distinct
    FROM joined GROUP BY c_nationkey, c_mktsegment
),
tot AS (
    SELECT cast(count(*) AS bigint) AS n_classes,
           cast(sum(class_rows) AS bigint) AS n_rows,
           cast(min(l_distinct) AS bigint) AS min_l
    FROM classes
)
SELECT ll.l AS l,
       t.n_classes, t.n_rows, t.min_l,
       cast(sum(CASE WHEN c.l_distinct < ll.l THEN 1 ELSE 0 END) AS bigint)
           AS classes_below,
       cast(sum(CASE WHEN c.l_distinct < ll.l THEN c.class_rows ELSE 0 END)
            AS bigint) AS rows_exposed,
       (cast(sum(CASE WHEN c.l_distinct < ll.l THEN c.class_rows ELSE 0 END)
             AS bigint) * 1000000) {idiv} t.n_rows AS exposed_frac_micro,
       CASE WHEN t.min_l >= ll.l THEN 1 ELSE 0 END AS l_diverse
FROM classes c CROSS JOIN tot t {l_rows}
GROUP BY ll.l, t.n_classes, t.n_rows, t.min_l
ORDER BY l
"""


@register("l_diversity_check", oracle=_ldiv_sql("duckdb"))
def l_diversity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit — the k-anonymity companion: a quasi-identifier
    class (nation × market segment over the customer-order rows) is
    exposed when its SENSITIVE attribute (order priority) takes fewer
    than l distinct values, because membership alone then reveals the
    sensitive value regardless of class size. One grouped pass computes
    class sizes and per-class distinct-sensitive counts, a 3-value l
    grid sweeps the summary — the sweep runs over the CLASS table
    (|nations|×|segments| rows), metadata-scale at any fact size.
    Companions: k_anonymity_check, dp_laplace_counts."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_ldiv_sql("spark"))


# ---------------------------------------------------------------------------
# Theil–Sen robust trend


_TS_WINDOW_DAYS = 180


def _epoch_day(dialect: str, col: str) -> str:
    if dialect == "spark":
        return f"cast(floor(unix_timestamp({col}) / 86400.0) AS bigint)"
    return f"cast(floor(epoch({col}) / 86400.0) AS bigint)"


def _theil_sen_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    day = _epoch_day(dialect, "o_orderdate")
    w = _TS_WINDOW_DAYS
    return f"""
WITH daily AS (
    SELECT {day} AS day,
           cast(sum(cast(floor(100.0 * o_totalprice) AS bigint)) AS bigint)
               AS rev_cents
    FROM orders GROUP BY 1
),
maxd AS (SELECT cast(max(day) AS bigint) AS md FROM daily),
win AS (
    SELECT d.day, d.rev_cents FROM daily d CROSS JOIN maxd m
    WHERE d.day > m.md - {w}
),
pairs AS (
    -- slopes quantized to micro-cents/day BEFORE the median, so the
    -- ordering key is an exact bigint; pair count is day-window², a
    -- constant (~16k) independent of row scale
    SELECT a.day AS d1, b.day AS d2,
           cast(floor(1000000.0 * (b.rev_cents - a.rev_cents)
                      / (b.day - a.day)) AS bigint) AS slope_micro
    FROM win a JOIN win b ON b.day > a.day
),
np AS (SELECT cast(count(*) AS bigint) AS n_pairs FROM pairs),
med AS (
    SELECT slope_micro AS ts_slope_micro
    FROM (
        SELECT slope_micro,
               row_number() OVER (ORDER BY slope_micro, d1, d2) AS rn
        FROM pairs
    ) r CROSS JOIN np
    WHERE r.rn = (np.n_pairs + 1) {idiv} 2
),
ols AS (
    -- exact decimal(38,0) normal equations on the same window (day
    -- offsets keep products small; decimal survives 10^13-cent days
    -- where bigint would overflow), one double division at the end
    SELECT cast(count(*) AS bigint) AS n_days,
           cast(floor(1000000.0 *
               cast(cast(count(*) AS decimal(38, 0))
                    * sum(cast((day - md) AS decimal(38, 0))
                          * cast(rev_cents AS decimal(38, 0)))
                    - sum(cast((day - md) AS decimal(38, 0)))
                      * sum(cast(rev_cents AS decimal(38, 0)))
                    AS double)
               / cast(cast(count(*) AS decimal(38, 0))
                      * sum(cast((day - md) AS decimal(38, 0))
                            * cast((day - md) AS decimal(38, 0)))
                      - sum(cast((day - md) AS decimal(38, 0)))
                        * sum(cast((day - md) AS decimal(38, 0)))
                      AS double)) AS bigint)
               AS ols_slope_micro
    FROM win CROSS JOIN maxd
)
SELECT o.n_days, np.n_pairs, m.ts_slope_micro, o.ols_slope_micro,
       abs(m.ts_slope_micro - o.ols_slope_micro) AS slope_gap_micro
FROM med m CROSS JOIN ols o CROSS JOIN np
"""


@register("theil_sen_trend", oracle=_theil_sen_sql("duckdb"))
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-revenue trend: the Theil–Sen slope (median of all
    pairwise slopes over the trailing 180 days) against the exact-bigint
    OLS slope on the same window — the gap flags outlier days dragging
    the least-squares line. The pairwise join runs over the aggregated
    DAY series: its size is window² (~16k pairs), a CONSTANT independent
    of fact-table scale, and the one grouped scan below it combines
    map-side; the median is a single bounded row_number pick.
    Companions: q6_forecast_revenue (OLS forecast), ewma_daily_revenue
    (smoothing), anomaly_mad_robust (outlier days)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_theil_sen_sql("spark"))


# ---------------------------------------------------------------------------
# Gini revenue concentration


def _gini_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    dec = "decimal(38, 0)"
    return f"""
WITH cust_rev AS (
    SELECT c.c_mktsegment AS seg, o.o_custkey,
           cast(sum(cast(floor(100.0 * o.o_totalprice) AS bigint)) AS bigint)
               AS rev_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment, o.o_custkey
),
ranked AS (
    SELECT seg, rev_cents,
           row_number() OVER (PARTITION BY seg
                              ORDER BY rev_cents, o_custkey) AS i
    FROM cust_rev
),
sums AS (
    -- decimal(38,0) accumulators: i·x reaches ~10^24 at 10^9-customer
    -- segments, past bigint; both engines sum decimals exactly
    SELECT seg, cast(count(*) AS bigint) AS n,
           cast(sum(cast(rev_cents AS {dec})) AS {dec}) AS sx,
           cast(sum(cast(i AS {dec}) * cast(rev_cents AS {dec})) AS {dec})
               AS six
    FROM ranked GROUP BY seg
)
SELECT seg, n,
       cast(sx AS bigint) AS total_rev_cents,
       -- numerator/denominator are EXACT decimals; each converts to
       -- double by one IEEE-nearest rounding (identical in both
       -- engines), then one division + floor
       cast(floor(1000000.0 *
            cast(cast(2 AS {dec}) * six - cast(n + 1 AS {dec}) * sx
                 AS double)
            / cast(cast(n AS {dec}) * sx AS double)) AS bigint)
           AS gini_micro
FROM sums
ORDER BY seg
"""


@register("gini_revenue_concentration", oracle=_gini_sql("duckdb"))
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment Gini coefficient of customer revenue — the standard
    concentration measure a commercial team reads next to the ABC/Pareto
    class split. Uses the rank-weighted identity
    G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ)/(n·Σ xᵢ) on exact cents: one grouped
    scan to per-customer revenue, one rank window per segment (the
    standard per-group sequencing shuffle), then a 5-row summary. The
    rank-weighted sums accumulate in decimal(38,0) — exact and
    order-proof in both engines, with headroom for 10⁹-customer
    segments where bigint would overflow. Companions: abc_pareto_class,
    decile_lift_table, rfm_segmentation."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_gini_sql("spark"))
