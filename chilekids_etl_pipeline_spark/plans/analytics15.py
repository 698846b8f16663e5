"""Analytics operators, batch 15 (round 7): k-anonymity risk profiling.

Public recipe: k-anonymity (Sweeney 2002) — the standard
re-identification risk measure for released microdata: a row is at
risk when its quasi-identifier combination is shared by fewer than k
rows. Re-expressed as one grouped scan + a k-grid sweep, the shape a
privacy review runs before any data release.

Dual-dialect SQL template; counts and risk fractions are exact
integers / micros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


_K_GRID = (2, 5, 10)


def _kanon_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    ks = ", ".join(str(k) for k in _K_GRID)
    k_rows = (
        f"LATERAL VIEW explode(array({ks})) kk AS k"
        if dialect == "spark"
        else f", LATERAL (SELECT unnest([{ks}]) AS k) kk"
    )
    return f"""
WITH qi AS (
    -- quasi-identifier tuple: nation x market segment x coarse balance
    -- bucket (the released columns an attacker can link on)
    SELECT c_custkey, c_nationkey, c_mktsegment,
           cast(floor(c_acctbal / 1000.0) AS int) AS bal_bucket
    FROM customer
),
grp AS (
    SELECT c_nationkey, c_mktsegment, bal_bucket,
           cast(count(*) AS bigint) AS grp_n
    FROM qi GROUP BY c_nationkey, c_mktsegment, bal_bucket
),
tot AS (
    SELECT cast(count(*) AS bigint) AS n_groups,
           cast(sum(grp_n) AS bigint) AS n_rows,
           cast(min(grp_n) AS bigint) AS min_group,
           cast(max(grp_n) AS bigint) AS max_group
    FROM grp
),
swept AS (
    SELECT kk.k, g.grp_n FROM grp g {k_rows}
)
SELECT s.k,
       t.n_rows, t.n_groups, t.min_group, t.max_group,
       cast(sum(CASE WHEN s.grp_n < s.k THEN 1 ELSE 0 END) AS bigint)
           AS n_small_groups,
       cast(sum(CASE WHEN s.grp_n < s.k THEN s.grp_n ELSE 0 END)
            AS bigint) AS rows_at_risk,
       (1000000 * cast(sum(CASE WHEN s.grp_n < s.k THEN s.grp_n
                                ELSE 0 END) AS bigint))
           {idiv} t.n_rows AS risk_frac_micro,
       -- satisfies k-anonymity iff NO group is smaller than k
       cast(sum(CASE WHEN s.grp_n < s.k THEN 1 ELSE 0 END) AS bigint) = 0
           AS k_anonymous
FROM swept s CROSS JOIN tot t
GROUP BY s.k, t.n_rows, t.n_groups, t.min_group, t.max_group
"""


@register("k_anonymity_check", oracle=_kanon_sql("duckdb"))
def k_anonymity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity risk profile over the released quasi-identifier tuple
    (nation × market segment × coarse balance bucket): for each k in the
    review grid, how many equivalence classes fall below k, how many
    ROWS those classes expose, the risk fraction in exact micros, and
    the k-anonymous verdict — the table a privacy review reads before a
    data release, and the measurement that drives
    generalize-or-suppress decisions. One grouped scan builds the
    equivalence classes (mergeable partials); the k-sweep runs over the
    group-size table only, never the data. Companion governance ops:
    gdpr_erasure_audit (deletion verification) and pii_redact
    (column-level scrubbing)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer"
    )
    return spark.sql(_kanon_sql("spark"))
