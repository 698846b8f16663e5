"""Analytics operators, batch 14 (round 7): split-conformal threshold
calibration with measured holdout coverage.

Public recipe: split conformal prediction (Vovk et al.; Angelopoulos &
Bates 2021 tutorial) — the distribution-free way to turn any score
into a threshold with a finite-sample coverage guarantee. Re-expressed
as the two-phase msb-histogram + exact-tail-rank pattern this catalog
already uses for top-k (revenue_topk_threshold), so the exact order
statistic never needs a global sort.

Dual-dialect SQL template; thresholds and coverages are exact integer
cents / micros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


_ALPHAS_PCT = (5, 10, 20)  # miscoverage levels


def _conformal_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    msb = "length(ltrim(bin(score_cents), '0'))"
    shl_b = (
        "shiftleft(cast(1 AS bigint), cast(b AS int))"
        if dialect == "spark"
        else "(cast(1 AS bigint) << cast(b AS int))"
    )
    alphas = ", ".join(str(a) for a in _ALPHAS_PCT)
    a_rows = (
        f"LATERAL VIEW explode(array({alphas})) aa AS alpha_pct"
        if dialect == "spark"
        else f", LATERAL (SELECT unnest([{alphas}]) AS alpha_pct) aa"
    )
    return f"""
WITH cal AS (
    -- the calibration split: a bounded 5% sample by construction (split
    -- conformal calibrates on a holdout, never the full stream)
    SELECT cast(round(o_totalprice * 100) AS bigint) AS score_cents
    FROM orders WHERE o_orderkey % 20 = 0
),
eval_set AS (
    SELECT cast(round(o_totalprice * 100) AS bigint) AS score_cents
    FROM orders WHERE o_orderkey % 20 = 1
),
n_cal AS (SELECT cast(count(*) AS bigint) AS n FROM cal),
-- per-alpha conformal rank: q_hat is the ceil((n+1)(1-alpha))-th
-- smallest calibration score, i.e. the (n - k + 1)-th LARGEST — the
-- exact pass only ever touches the alpha tail
ks AS (
    SELECT alpha_pct,
           n,
           n + 1 - ((((n + 1) * (100 - alpha_pct)) + 99) {idiv} 100)
               AS k_from_top
    FROM n_cal {a_rows}
),
hist AS (
    SELECT {msb} AS b, cast(count(*) AS bigint) AS cnt
    FROM cal GROUP BY {msb}
),
cum AS (
    SELECT b, cnt,
           cast(sum(cnt) OVER (ORDER BY b DESC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS bigint) AS n_at_or_above
    FROM hist
),
-- smallest power-of-two floor guaranteed to contain the k-th largest:
-- the highest bucket whose top-cumulative count reaches k (max(), the
-- crossing bucket — see revenue_topk_threshold)
thr AS (
    SELECT k.alpha_pct, k.n, k.k_from_top,
           coalesce(max(CASE WHEN c.n_at_or_above >= k.k_from_top
                             THEN {shl_b} {idiv} 2 END),
                    cast(0 AS bigint)) AS slice_floor
    FROM ks k CROSS JOIN cum c
    GROUP BY k.alpha_pct, k.n, k.k_from_top
),
ranked AS (
    SELECT t.alpha_pct, t.n, t.k_from_top, c.score_cents,
           cast(row_number() OVER (PARTITION BY t.alpha_pct
                                   ORDER BY c.score_cents DESC)
                AS bigint) AS rk
    FROM thr t JOIN cal c ON c.score_cents >= t.slice_floor
),
qhat AS (
    SELECT alpha_pct, n AS n_cal, k_from_top,
           score_cents AS q_hat_cents
    FROM ranked WHERE rk = k_from_top
),
cov AS (
    SELECT q.alpha_pct,
           cast(count(*) AS bigint) AS n_eval,
           cast(sum(CASE WHEN e.score_cents <= q.q_hat_cents
                         THEN 1 ELSE 0 END) AS bigint) AS n_covered
    FROM qhat q CROSS JOIN eval_set e
    GROUP BY q.alpha_pct
)
SELECT q.alpha_pct, q.n_cal, q.k_from_top, q.q_hat_cents,
       c.n_eval,
       (1000000 * c.n_covered) {idiv} c.n_eval AS coverage_micro,
       (100 - q.alpha_pct) * 10000 AS target_micro
FROM qhat q JOIN cov c ON c.alpha_pct = q.alpha_pct
"""


@register("conformal_threshold_calibration", oracle=_conformal_sql("duckdb"))
def conformal_threshold_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal threshold calibration: for each miscoverage α,
    q̂ = the ⌈(n+1)(1−α)⌉-th smallest calibration score — the
    distribution-free threshold guaranteeing ≥1−α coverage on
    exchangeable data — plus the MEASURED coverage on a disjoint
    holdout. The exact order statistic is found with the catalog's
    two-phase pattern: an additive msb histogram (~40 rows of state)
    brackets the (n−k+1)-th LARGEST score, and the exact rank runs only
    over the α tail above the bracketing power-of-two floor — never a
    global sort, and the tail shrinks as α does. Calibration and
    holdout are bounded hash splits by construction (split conformal
    calibrates on a sample), so every stage is histogram-scale. Rank
    ties are harmless: tied scores are interchangeable for a threshold
    (any tied row yields the same q̂). Coverage arithmetic is exact
    integer micros; a probe pins coverage ≈ target and monotonicity in
    α."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_conformal_sql("spark"))
