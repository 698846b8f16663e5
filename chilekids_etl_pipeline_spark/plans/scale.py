"""Scale-technique queries: skew-salted aggregation, KMV distinct sketch,
exact percentiles.

These demonstrate (and oracle-check) the patterns that keep aggregations
healthy at 100 TB: two-stage salting for power-law keys, a deterministic
k-minimum-values sketch for approximate distinct counts that both engines
compute bit-identically (unlike HLL, whose register layout is
engine-specific), and per-group interpolated percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.skew import salted_agg
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# salted aggregation over a skewed key (5 event types ← millions of rows)


_SALTED_ORACLE = """
SELECT event_type,
       count(*) AS n,
       cast(round(sum(cast(value AS decimal(10,2))), 2) AS double) AS total,
       cast(min(value) AS double) AS min_v,
       cast(max(value) AS double) AS max_v
FROM events
GROUP BY event_type
"""


@register("skewed_agg_salted", oracle=_SALTED_ORACLE)
def skewed_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy on a 5-value key is maximal skew at cluster scale: every hot
    key lands on one reducer. Two-stage salted aggregation (16 sub-keys per
    key, partial agg, combine) produces the identical result with bounded
    per-reducer input. The oracle is the plain GROUP BY — exactness of the
    decomposition is the point."""
    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev.withColumn("value_dec", F.col("value").cast("decimal(10,2)")),
        ["event_type"],
        {
            "n": "count:*",
            "total_dec": "sum:value_dec",
            "min_v": "min:value",
            "max_v": "max:value",
        },
        salt_col=F.col("event_id"),
        salt_buckets=16,
    )
    return out.select(
        "event_type",
        "n",
        F.round(F.col("total_dec"), 2).cast("double").alias("total"),
        F.col("min_v").cast("double"),
        F.col("max_v").cast("double"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — engine-portable approx distinct


_KMV_K = 64

_KMV_ORACLE = f"""
WITH hashed AS (
    SELECT DISTINCT md5(cast(user_id AS string)) AS h FROM events
),
kmin AS (SELECT h FROM hashed ORDER BY h LIMIT {_KMV_K}),
stats AS (
    SELECT count(*) AS k,
           max(cast(('0x' || substr(h, 1, 8)) AS bigint) / 4294967296.0) AS kth_frac
    FROM kmin
),
exact AS (SELECT count(DISTINCT user_id) AS exact_distinct FROM events)
SELECT cast(round(CASE WHEN k < {_KMV_K} THEN k
                       ELSE (k - 1) / kth_frac END, 2) AS double) AS kmv_estimate,
       exact_distinct
FROM stats CROSS JOIN exact
"""


@register("approx_distinct_kmv", oracle=_KMV_ORACLE)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct estimator: keep the k smallest md5 hashes
    (a distributed TakeOrdered — each partition contributes its local top-k,
    ~k·32 bytes cross the wire); estimate = (k-1)/kth_min. Deterministic
    md5 order makes the sketch bit-identical in any engine — the portable
    alternative to HLL when sketches must be mergeable across systems."""
    ev = load_table(spark, sf_dir, "events")
    hashed = ev.select(F.md5(F.col("user_id").cast("string")).alias("h")).distinct()
    kmin = hashed.orderBy("h").limit(_KMV_K)
    stats = kmin.agg(
        F.count(F.lit(1)).alias("k"),
        F.max(F.expr("conv(substr(h, 1, 8), 16, 10) / 4294967296.0")).alias("kth_frac"),
    )
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return stats.crossJoin(exact).select(
        F.round(
            F.when(F.col("k") < _KMV_K, F.col("k").cast("double")).otherwise(
                (F.col("k") - 1) / F.col("kth_frac")
            ),
            2,
        )
        .cast("double")
        .alias("kmv_estimate"),
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# per-group interpolated percentiles


_PCT_ORACLE = """
SELECT o_orderstatus,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders
GROUP BY o_orderstatus
"""


@register("order_value_percentiles", oracle=_PCT_ORACLE)
def order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``, both linear interpolation). At extreme scale
    the same query swaps in approx_percentile (t-digest) — exact is kept
    here so the oracle can verify to 4 decimals."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )


# ---------------------------------------------------------------------------
# marts build_all: one refresh pass over every mart (src/marts.py:45)


_MART_NAMES = [
    "financials_monthly",
    "expenses_by_category",
    "web_transactions",
    "dim_clients",
    "dim_categories",
    "dim_vendors",
    "campaigns_summary",
]


def _build_all_oracle() -> str:
    # Resolved lazily (registry supports callable oracles) so this module
    # can register before marts.py does — the composed SQL only needs the
    # marts entries to exist by the time oracle_sql() is called.
    from .registry import QUERIES

    parts = [
        f"SELECT '{n}' AS mart, count(*) AS n FROM ({QUERIES[n].oracle})"
        for n in _MART_NAMES
    ]
    return " UNION ALL ".join(parts)


@register("build_all_marts", oracle=_build_all_oracle)
def build_all_marts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's ``marts.build_all`` (src/marts.py:45): refresh every
    mart in one call. Here each mart is a lazy plan unioned into a single
    job — Spark schedules them together and shares the scan of any common
    input stage instead of refreshing views serially."""
    from .registry import queries as _qs

    qs = _qs()
    counts = [
        qs[n](spark, sf_dir)
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit(n).alias("mart"), "n")
        for n in _MART_NAMES
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


# ---------------------------------------------------------------------------
# planted hot-key join: the skew-stress probe promoted into the gate

_SKEWP_SALT = 16
_SKEWP_COLD_KEYS = 100000

# deterministic planted power-law key over the unique lineitem rowid
# (l_orderkey*8 + l_linenumber): an md5 coin sends ~50% of ALL rows to
# key 0, the rest spread uniformly over 100k keys — the worst join-skew
# shape (tools/skew_stress.py, SKEWSTRESS_sf1*.json). Integer-exact coin
# compare (first 8 hex nibbles < 2^31) so both engines draw identically.
_SKEWP_DIGEST = "md5(cast(l_orderkey * 8 + l_linenumber AS string))"


def _skewp_key_sql(dialect: str) -> str:
    if dialect == "spark":
        coin = f"cast(conv(substr({_SKEWP_DIGEST}, 1, 8), 16, 10) AS bigint)"
        spread = f"cast(conv(substr({_SKEWP_DIGEST}, 9, 8), 16, 10) AS bigint)"
    else:
        coin = f"cast(('0x' || substr({_SKEWP_DIGEST}, 1, 8)) AS bigint)"
        spread = f"cast(('0x' || substr({_SKEWP_DIGEST}, 9, 8)) AS bigint)"
    return (
        f"CASE WHEN {coin} < 2147483648 THEN 0 "
        f"ELSE 1 + {spread} % {_SKEWP_COLD_KEYS} END"
    )


def _skewp_oracle() -> str:
    # the plain join computed ONCE, cross-joined with both strategy
    # labels: the oracle literally STATES that every strategy must equal
    # the unprotected plan's answer — the checksum-equality proof from
    # the skew-stress probe, promoted into the per-round gate.
    return f"""
WITH fact AS (
    SELECT {_skewp_key_sql('duckdb')} AS k, l_extendedprice
    FROM lineitem
),
dim AS (
    SELECT range AS k, cast(range % 97 AS int) AS w
    FROM range(0, {_SKEWP_COLD_KEYS + 1})
),
plain AS (
    SELECT CASE WHEN f.k = 0 THEN 'hot' ELSE 'cold' END AS key_class,
           cast(count(*) AS bigint) AS n_rows,
           cast(count(DISTINCT f.k) AS bigint) AS n_keys,
           cast(round(sum(cast(cast(f.l_extendedprice AS decimal(12,2)) * d.w
                               AS decimal(18,2))), 2) AS double) AS total_weighted
    FROM fact f JOIN dim d ON f.k = d.k
    GROUP BY 1
)
SELECT s.strategy, p.key_class, p.n_rows, p.n_keys, p.total_weighted
FROM plain p
CROSS JOIN (SELECT 'broadcast' AS strategy UNION ALL SELECT 'salted') s
"""


@register("skew_join_strategies", oracle=_skewp_oracle)
def skew_join_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-8 skew-stress finding as a regression-checked entry: a
    fact join where ~50% of all lineitem rows land on ONE planted key
    (remainder uniform over 100k keys), executed through BOTH protected
    strategies the catalog prescribes — explicit broadcast (the default
    for any dim under the threshold) and the salted decomposition (dim
    replicated across 16 sub-keys, fact salted by rowid; the structural
    fix when both sides are too big to broadcast). The oracle computes
    the plain unprotected join ONCE and asserts each strategy matches it
    exactly — the checksum-equality proof from tools/skew_stress.py
    (SKEWSTRESS_sf1_hot90.json) promoted into the per-round gate. Why
    this matters at 100 TB: the probe measured that AQE's skew-join
    split does NOT fire under its 256 MB default threshold while the hot
    partition stalls a reducer (sort-merge 2.6-2.7 s vs salted 1.73 s vs
    broadcast 1.02 s at sf1/hot90), so the catalog's layered strategy —
    broadcast every dim that fits, salt when it doesn't, AQE as backstop
    — is pinned here and in the plan test."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    fact = li.select(
        F.expr(_skewp_key_sql("spark")).alias("k"),
        "l_extendedprice",
    )
    dim = spark.range(0, _SKEWP_COLD_KEYS + 1).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("int").alias("w")
    )

    def _agg(joined: DataFrame, label: str) -> DataFrame:
        return (
            joined.groupBy(
                F.when(F.col("k") == 0, "hot").otherwise("cold").alias("key_class")
            )
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count_distinct(F.col("k")).alias("n_keys"),
                F.round(
                    F.sum(
                        (
                            F.col("l_extendedprice").cast("decimal(12,2)")
                            * F.col("w")
                        ).cast("decimal(18,2)")
                    ),
                    2,
                )
                .cast("double")
                .alias("total_weighted"),
            )
            .select(F.lit(label).alias("strategy"), "*")
        )

    bcast = _agg(fact.join(F.broadcast(dim), "k"), "broadcast")

    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_SKEWP_SALT - 1)))
    )
    fact_salted = li.select(
        F.expr(_skewp_key_sql("spark")).alias("k"),
        "l_extendedprice",
        ((F.col("l_orderkey") * 8 + F.col("l_linenumber")) % _SKEWP_SALT)
        .cast("int")
        .alias("salt"),
    )
    salted = _agg(fact_salted.join(dim_salted, ["k", "salt"]), "salted")

    return bcast.unionByName(salted)
