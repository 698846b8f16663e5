"""Analytics operators, batch 21 (round 7): Poisson-bootstrap
confidence interval.

Public recipe: the Poisson bootstrap (Chamandy et al. 2012, "Estimating
uncertainty for massive data streams" — Google's distributed bootstrap;
Efron's bootstrap re-expressed for one-pass engines): instead of
resampling n rows with replacement (which needs global coordination),
each row enters resample b with an independent Poisson(1) count. All B
resamples accumulate in ONE grouped pass, which is why this is the
bootstrap that works at 100 TB.

The Poisson(1) draws are deterministic inverse-CDF lookups on a salted
hash-uniform (exact micro grid), so both engines draw identical counts
and the CI is reproducible.
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


_B = 100  # bootstrap resamples
_SALT = "pboot_r7"

# Poisson(1) inverse CDF on the micro grid: P(X<=k) thresholds
_POIS_CUM = (367879, 735759, 919699, 981012, 996340, 999406, 999917)


def _pois_case(u: str) -> str:
    # deterministic Poisson(1) from a uniform micro draw (identical
    # CASE tree in both dialects)
    branches = "".join(
        f" WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS_CUM)
    )
    return f"(CASE{branches} ELSE 7 END)"


def _bootstrap_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    h = _h32(dialect, f"concat(user_id, '_', b, '_', '{_SALT}')")
    u = f"({h} % 1000000)"
    pois = _pois_case("u_micro")
    if dialect == "spark":
        b_rows = f"LATERAL VIEW explode(sequence(0, {_B - 1})) bb AS b"
    else:
        b_rows = f", LATERAL (SELECT unnest(range(0, {_B})) AS b) bb"
    ep = (
        "cast(unix_timestamp(ts) AS bigint)"
        if dialect == "spark"
        else "cast(floor(epoch(ts)) AS bigint)"
    )
    return f"""
WITH per_user AS (
    -- converted = purchased within 1 day of first activity (the
    -- activation metric; lifetime purchase is ~1.0 on this corpus and
    -- a CI over a constant is vacuous); one grouped pass, two mins
    SELECT user_id,
           CASE WHEN min(CASE WHEN event_type = 'purchase'
                         THEN {ep} END)
                     <= min({ep}) + 86400
                THEN 1 ELSE 0 END AS converted
    FROM events GROUP BY user_id
),
replicated AS (
    -- row x resample grid with a deterministic Poisson(1) weight; the
    -- grid is a lateral explode (no join), and the aggregation below
    -- combines map-side, so the shuffle carries B rows per partition
    SELECT bb.b, converted, {u} AS u_micro
    FROM per_user {b_rows}
),
estimates AS (
    SELECT b,
           cast(sum({pois} * converted) AS bigint) AS conv_w,
           cast(sum({pois}) AS bigint) AS n_w
    FROM replicated GROUP BY b
),
rates AS (
    SELECT b, (conv_w * 1000000) {idiv} n_w AS rate_micro
    FROM estimates WHERE n_w > 0
),
ranked AS (
    SELECT rate_micro,
           row_number() OVER (ORDER BY rate_micro, b) AS rn,
           count(*) OVER () AS nb
    FROM rates
),
point AS (
    SELECT cast(sum(converted) AS bigint) * 1000000 {idiv} count(*)
               AS point_micro,
           cast(count(*) AS bigint) AS n_users
    FROM per_user
)
SELECT p.n_users, {_B} AS n_resamples, p.point_micro,
       max(CASE WHEN r.rn = greatest(1, (nb * 25) {idiv} 1000)
           THEN r.rate_micro END) AS ci_lo_micro,
       max(CASE WHEN r.rn = greatest(1, (nb * 500) {idiv} 1000)
           THEN r.rate_micro END) AS ci_mid_micro,
       max(CASE WHEN r.rn = greatest(1, (nb * 975) {idiv} 1000)
           THEN r.rate_micro END) AS ci_hi_micro
FROM ranked r CROSS JOIN point p
GROUP BY p.n_users, p.point_micro
"""


@register("bootstrap_ci_conversion", oracle=_bootstrap_sql("duckdb"))
def bootstrap_ci_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap CI for the user conversion rate: each user
    enters each of 100 resamples with a deterministic hash-drawn
    Poisson(1) weight, all resamples accumulate in ONE grouped pass
    (map-side combinable — the shuffle carries 100 rows per partition),
    and the CI is a nearest-rank quantile pick over the 100 resample
    estimates. This is the bootstrap that distributes: row-resampling
    needs global coordination, Poisson weights don't (Chamandy et al.
    2012). The inverse-CDF Poisson table is an exact micro-grid CASE,
    so both engines draw identical weights. Companions:
    ab_test_conversion (two-sample z), conformal_threshold_calibration
    (distribution-free coverage), importance_weighted_stats
    (design-weighted estimates)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_bootstrap_sql("spark"))
