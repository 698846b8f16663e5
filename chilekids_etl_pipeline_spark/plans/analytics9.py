"""Extended analytics, batch 9: survival analysis (Kaplan-Meier churn
curve), experimentation (two-proportion conversion z-test), cohort LTV
accumulation, and day-of-week seasonality indexing — the statistical
mart layer a growth/analytics team runs daily.

Dual-dialect SQL templates; products become exp(sum(ln)) so the
cumulative survival estimator stays a windowed aggregate. Registered
after the external gate window; rotates next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Kaplan-Meier survival (customer lifetime until churn)

def _km_sql(dialect: str) -> str:
    if dialect == "spark":
        life = "datediff(last_date, first_date)"
        horizon = "datediff(ref_date, last_date)"
    else:
        life = "datediff('day', first_date, last_date)"
        horizon = "datediff('day', last_date, ref_date)"
    return f"""
WITH spans AS (
    SELECT o_custkey,
           cast(min(o_orderdate) AS date) AS first_date,
           cast(max(o_orderdate) AS date) AS last_date
    FROM orders GROUP BY o_custkey
),
ref AS (SELECT cast(max(o_orderdate) AS date) AS ref_date FROM orders),
subjects AS (
    SELECT o_custkey,
           cast({life} AS bigint) AS lifetime_days,
           {horizon} > 365 AS churned
    FROM spans CROSS JOIN ref
),
-- month-bucketed event times keep the curve table small
buckets AS (
    SELECT CASE WHEN lifetime_days = 0 THEN 0
                ELSE (lifetime_days - 1) DIV_30 + 1 END AS t,
           cast(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS bigint) AS d,
           cast(count(*) AS bigint) AS ended_here
    FROM subjects GROUP BY 1
),
ordered AS (
    SELECT t, d, ended_here,
           cast(sum(ended_here) OVER (ORDER BY t DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bigint)
               AS n_at_risk
    FROM buckets
)
SELECT t AS month_bucket, n_at_risk, d AS n_churn_events,
       -- d = n_at_risk is a terminal event time: the KM factor is
       -- exactly 0, which exp(sum(ln)) cannot represent, so a
       -- cumulative extinction flag pins the curve (and every later
       -- bucket) to 0 instead of silently skipping the factor
       CASE WHEN max(CASE WHEN d >= n_at_risk AND d > 0
                          THEN 1 ELSE 0 END)
                 OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
            THEN cast(0 AS double)
            ELSE round(exp(sum(CASE WHEN d < n_at_risk AND d > 0
                          THEN ln(1 - d / cast(n_at_risk AS double))
                          ELSE 0 END)
                 OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
             6) END AS survival
FROM ordered
"""


def _km_dialect(dialect: str) -> str:
    div = "DIV 30" if dialect == "spark" else "// 30"
    return _km_sql(dialect).replace("DIV_30", div)


@register("survival_km_curve", oracle=_km_dialect("duckdb"))
def survival_km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of customer lifetime (first order →
    last order, churn = 365 days idle at the horizon, still-active
    customers censored): the estimator every retention team wants and
    most SQL engines make awkward — the cumulative product Π(1 - d/n)
    becomes exp of a windowed sum of logs, so the whole curve is one
    window pass over the MONTH-BUCKETED event-time table (≤ ~90 rows
    at any data scale; the per-customer reduction is the only
    fact-sized shuffle). At-risk counts come from a reverse-cumulative
    sum rather than a per-time self-join. A bucket where every
    remaining at-risk subject churns (d = n_at_risk) is a true
    extinction event — the curve drops to exactly 0 there and stays 0,
    per the KM definition, via a cumulative flag rather than ln(0)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_km_dialect("spark"))


# ---------------------------------------------------------------------------
# A/B conversion z-test

def _ab_sql(dialect: str) -> str:
    return """
WITH assignments AS (
    SELECT user_id, user_id % 2 AS arm FROM events GROUP BY user_id
),
outcomes AS (
    SELECT a.arm,
           cast(count(*) AS bigint) AS n_users,
           cast(sum(CASE WHEN p.purchased THEN 1 ELSE 0 END) AS bigint)
               AS n_converted
    FROM assignments a
    LEFT JOIN (
        SELECT user_id, count(*) > 0 AS purchased
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ) p ON p.user_id = a.user_id
    GROUP BY a.arm
),
wide AS (
    SELECT
        max(CASE WHEN arm = 0 THEN n_users END) AS n0,
        max(CASE WHEN arm = 0 THEN n_converted END) AS c0,
        max(CASE WHEN arm = 1 THEN n_users END) AS n1,
        max(CASE WHEN arm = 1 THEN n_converted END) AS c1
    FROM outcomes
)
SELECT n0 AS n_control, c0 AS conv_control,
       round(c0 / cast(n0 AS double), 6) AS rate_control,
       n1 AS n_treat, c1 AS conv_treat,
       round(c1 / cast(n1 AS double), 6) AS rate_treat,
       round(c1 / cast(n1 AS double) - c0 / cast(n0 AS double), 6)
           AS abs_lift,
       round((c1 / cast(n1 AS double) - c0 / cast(n0 AS double))
             / nullif(sqrt(((c0 + c1) / cast(n0 + n1 AS double))
                    * (1 - (c0 + c1) / cast(n0 + n1 AS double))
                    * (1 / cast(n0 AS double) + 1 / cast(n1 AS double))),
                      cast(0 AS double)),
             4) AS z_stat
FROM wide
"""


@register("ab_test_conversion", oracle=_ab_sql("duckdb"))
def ab_test_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion between two user
    arms (deterministic hash assignment here; in production the arm
    column comes from the experiment system) — the read-out every A/B
    platform computes. Per-user conversion reduces the event stream
    once; the z statistic is pure scalar algebra on the 2-row arm
    table, pivoted wide so the output is a single row a dashboard can
    alert on. |z| > 1.96 ≈ p < 0.05 under the pooled-variance normal
    approximation."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ab_sql("spark"))


# ---------------------------------------------------------------------------
# cohort LTV accumulation

def _ltv_sql(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    if dialect == "spark":
        months = ("(year(o_orderdate) - year(cohort_month)) * 12 "
                  "+ month(o_orderdate) - month(cohort_month)")
    else:
        months = ("(date_part('year', o_orderdate) "
                  "- date_part('year', cohort_month)) * 12 "
                  "+ date_part('month', o_orderdate) "
                  "- date_part('month', cohort_month)")
    return f"""
WITH firsts AS (
    SELECT o_custkey,
           cast(date_trunc('month', min(o_orderdate)) AS date)
               AS cohort_month
    FROM orders GROUP BY o_custkey
),
sized AS (
    SELECT cohort_month, cast(count(*) AS bigint) AS cohort_size
    FROM firsts GROUP BY cohort_month
),
monthly AS (
    -- exact decimal so the cumulative sum (and the per-customer
    -- division below) cannot flip a rounding boundary across engines
    SELECT f.cohort_month,
           cast({months} AS bigint) AS months_since,
           sum(cast(o.o_totalprice AS decimal(18, 2))) AS revenue
    FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    GROUP BY f.cohort_month, {months}
),
accum AS (
    SELECT cohort_month, months_since,
           sum(revenue) OVER (PARTITION BY cohort_month
                              ORDER BY months_since
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS cum_revenue
    FROM monthly
)
SELECT a.cohort_month, a.months_since,
       cast(a.cum_revenue AS double) AS cum_revenue,
       s.cohort_size,
       -- integer cents, floored: round() at any scale can land on a
       -- representable half (cents/8 = x.5) where Spark rounds half-up
       -- and DuckDB half-even
       cast(cast(a.cum_revenue * 100 AS bigint) {idiv} s.cohort_size
            AS bigint) AS ltv_cents_per_customer
FROM accum a JOIN sized s ON s.cohort_month = a.cohort_month
WHERE a.months_since <= 24 AND a.cohort_month <= cast('1996-12-31' AS date)
"""


@register("customer_ltv_cohort", oracle=_ltv_sql("duckdb"))
def customer_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: customers grouped by first-order month, each
    cohort's revenue accumulated over months-since-acquisition and
    normalized per customer — the payback-period table acquisition
    spend is judged against (the revenue twin of
    events_cohort_retention). One fact-sized join back to the
    first-order table (both shuffled on custkey), then the cumulative
    window runs over the cohort × month matrix, which is
    calendar-bounded at any data scale. Cohorts are cut at 1996 and 24
    months so every reported cohort has a full observation window."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_ltv_sql("spark"))


# ---------------------------------------------------------------------------
# day-of-week seasonality

def _dow_sql(dialect: str) -> str:
    dow = (
        "dayofweek(o_orderdate)"
        if dialect == "spark"
        else "(date_part('dow', o_orderdate) + 1)"
    )
    return f"""
WITH daily AS (
    SELECT cast({dow} AS bigint) AS dow,
           cast(count(*) AS bigint) AS n_orders,
           sum(o_totalprice) AS revenue
    FROM orders GROUP BY 1
),
tot AS (
    SELECT sum(revenue) / 7 AS mean_rev,
           sum(n_orders) / cast(7 AS double) AS mean_orders
    FROM daily
)
SELECT d.dow, d.n_orders,
       round(d.revenue, 2) AS revenue,
       round(d.revenue / t.mean_rev, 6) AS revenue_index,
       round(d.n_orders / t.mean_orders, 6) AS volume_index
FROM daily d CROSS JOIN tot t
"""


@register("orders_seasonality_dow", oracle=_dow_sql("duckdb"))
def orders_seasonality_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: each weekday's revenue and volume
    relative to the weekly mean (index 1.0 = no seasonality) — the
    decomposition input for staffing/forecast baselines and the
    denominator when an anomaly detector must not fire every weekend.
    One 7-row aggregate and a 1-row mean broadcast. Spark's dayofweek
    is 1=Sunday; DuckDB's dow is 0=Sunday, shifted +1 in the template
    so both engines emit the same bucket ids."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_dow_sql("spark"))


# ---------------------------------------------------------------------------
# Bloom-filter semi-join pruning

_BLOOM_BITS = 16384  # m = 2^14 bits -> 261 63-bit words (bit 63 stays clear: DuckDB checks overflow on 1<<63)
_BLOOM_K = 3
_BLOOM_CUTOFF = 400000  # orders above this price form the filter


_BLOOM_WORDS = (_BLOOM_BITS + 62) // 63  # 261 words cover 16384 bits


def _bloom_sql(dialect: str) -> str:
    s = "string" if dialect == "spark" else "varchar"
    idiv = "DIV" if dialect == "spark" else "//"
    shl = (
        "shiftleft(cast(1 AS bigint), cast(p % 63 AS int))"
        if dialect == "spark"
        else "(cast(1 AS bigint) << cast(p % 63 AS int))"
    )
    ex = "explode" if dialect == "spark" else "unnest"
    ks = (
        f"{ex}(sequence(0, {_BLOOM_K - 1}))"
        if dialect == "spark"
        else f"{ex}(range(0, {_BLOOM_K}))"
    )

    def pos(i: str) -> str:
        # salted md5 bit position; i is a SQL expression (column or literal)
        if dialect == "spark":
            return (f"cast(conv(substr(md5(concat(cast({i} AS {s}), ':', "
                    f"cast(key AS {s}))), 1, 8), 16, 10) AS bigint) "
                    f"% {_BLOOM_BITS}")
        return (f"cast(('0x' || substr(md5(concat(cast({i} AS {s}), ':', "
                f"cast(key AS {s}))), 1, 8)) AS bigint) % {_BLOOM_BITS}")

    if dialect == "spark":
        words = f"SELECT explode(sequence(0, {_BLOOM_WORDS - 1})) AS w"
        # sort_array on struct(w, bits) orders by w: deterministic arr
        arr = ("transform(sort_array(collect_list(named_struct("
               "'w', w, 'bits', bits))), x -> x.bits)")

        def word_at(p: str) -> str:
            return f"element_at(ba.arr, cast(({p}) {idiv} 63 AS int) + 1)"
    else:
        words = f"SELECT unnest(range(0, {_BLOOM_WORDS})) AS w"
        arr = "list(bits ORDER BY w)"

        def word_at(p: str) -> str:
            return f"ba.arr[cast(({p}) // 63 AS int) + 1]"

    def bit_set(i: int) -> str:
        # the whole k-th probe: position, word lookup, mask test — inline,
        # so the probe side is a single map over the broadcast word array
        p = f"p{i}"
        mask = (
            f"shiftleft(cast(1 AS bigint), cast({p} % 63 AS int))"
            if dialect == "spark"
            else f"(cast(1 AS bigint) << cast({p} % 63 AS int))"
        )
        return f"({word_at(p)} & {mask}) != 0"

    # NOTE: persisting the filter-key set was A/B'd and rejected — the
    # cache-build job serializes ahead of everything (~+0.15 s) while
    # the three inline scans are cheap (0.26 s each) and overlap across
    # AQE jobs; the keys CTE stays inline.
    keys_body = (
        f"SELECT DISTINCT o_orderkey AS key FROM orders "
        f"WHERE o_totalprice > {_BLOOM_CUTOFF}"
    )
    test_all = " AND ".join(bit_set(i) for i in range(_BLOOM_K))
    pos_cols = ", ".join(f"{pos(str(i))} AS p{i}" for i in range(_BLOOM_K))
    return f"""
WITH keys AS ({keys_body}),
key_bits AS (
    SELECT key, i, {pos('i')} AS p
    FROM (SELECT key, {ks} AS i FROM keys) ki
),
bloom AS (
    SELECT p {idiv} 63 AS w, bit_or({shl}) AS bits
    FROM key_bits GROUP BY p {idiv} 63
),
words AS ({words}),
bloom_arr AS (
    SELECT {arr} AS arr
    FROM (SELECT wd.w, coalesce(b.bits, cast(0 AS bigint)) AS bits
          FROM words wd LEFT JOIN bloom b ON b.w = wd.w) dense
),
probes AS (SELECT DISTINCT l_orderkey AS key FROM lineitem),
probe_pos AS (
    SELECT key, {pos_cols} FROM probes
),
tested AS (
    SELECT pp.key,
           CASE WHEN {test_all} THEN 1 ELSE 0 END AS all_bits_set,
           CASE WHEN k.key IS NOT NULL THEN 1 ELSE 0 END AS is_member
    FROM probe_pos pp
    CROSS JOIN bloom_arr ba
    LEFT JOIN keys k ON k.key = pp.key
)
SELECT cast((SELECT count(*) FROM keys) AS bigint) AS n_filter_keys,
       cast(count(*) AS bigint) AS n_probes,
       cast(sum(all_bits_set) AS bigint) AS n_candidates,
       cast(sum(is_member) AS bigint) AS n_true_members,
       cast(sum(CASE WHEN all_bits_set = 1 AND is_member = 0
                     THEN 1 ELSE 0 END) AS bigint) AS n_false_positives,
       round(sum(CASE WHEN all_bits_set = 1 AND is_member = 0
                      THEN 1 ELSE 0 END)
             / cast(count(*) - sum(is_member) AS double), 6)
           AS false_positive_rate
FROM tested
"""


@register("bloom_prune_semijoin", oracle=_bloom_sql("duckdb"))
def bloom_prune_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter semi-join pruning, with its false-positive
    rate measured against the exact semi-join in the same output. The
    filter side reduces to 261 63-bit words (bit 63 stays clear: DuckDB checks overflow on 1<<63) via bit_or aggregation
    (k=3 salted-md5 bit positions per key) — a sketch small enough to
    BROADCAST, which is the entire point at 100 TB: the big fact side
    is pre-filtered by bitmask probes before the real shuffle join, so
    only candidates (true members + the measured ~small FP rate) pay
    shuffle I/O. This is what Spark's runtime row-group/shuffle Bloom
    pruning does internally, built here from portable integer
    expressions so the oracle verifies every bit. A Bloom filter never
    false-negatives — the probe's n_candidates ≥ n_true_members
    invariant is pinned by a probe test.

    The probe side is deliberately explode-free: the 261 filter words
    densify into ONE array row (cross-joined = broadcast to every probe
    partition) and all k bit tests evaluate inline per probe row — no
    per-bit explode, no re-grouping shuffle, no probe⋈truth join. That
    cut the r4 wall 2.0 → ~1.25 s at sf0.1 (the rest is serial
    single-row-group scans + AQE job rounds) and is exactly how the
    sketch ships at 100 TB: the array is the broadcast variable."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_bloom_sql("spark"))


# ---------------------------------------------------------------------------
# PSI feature drift

def _psi_sql(dialect: str) -> str:
    idiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH stamped AS (
    SELECT o_totalprice,
           cast(round(o_totalprice * 100, 0) AS bigint) AS cents,
           o_orderdate <= cast('1995-06-30' AS date) AS is_ref
    FROM orders
),
binned AS (
    SELECT is_ref,
           CASE WHEN msb >= 3
                THEN msb * 4 + ((cents >> (msb - 3)) % 4)
                ELSE msb * 4 END AS bin_id
    FROM (SELECT is_ref, cents, length(bin(cents)) AS msb FROM stamped) m
),
hist AS (
    SELECT bin_id,
           cast(sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS bigint) AS n_ref,
           cast(sum(CASE WHEN is_ref THEN 0 ELSE 1 END) AS bigint) AS n_cur
    FROM binned GROUP BY bin_id
),
tot AS (
    SELECT cast(sum(n_ref) AS bigint) AS t_ref,
           cast(sum(n_cur) AS bigint) AS t_cur
    FROM hist
),
terms AS (
    SELECT h.bin_id,
           (h.n_ref + 1) / cast(t.t_ref + nb.n AS double) AS p,
           (h.n_cur + 1) / cast(t.t_cur + nb.n AS double) AS q
    FROM hist h
    CROSS JOIN tot t
    CROSS JOIN (SELECT cast(count(*) AS bigint) AS n FROM hist) nb
)
SELECT cast(count(*) AS bigint) AS n_bins,
       round(sum((p - q) * ln(p / q)), 6) AS psi,
       round(max(abs(p - q)), 6) AS max_bin_shift
FROM terms
"""


@register("psi_feature_drift", oracle=_psi_sql("duckdb"))
def psi_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-value distribution
    between a reference window (≤ mid-1995) and the current one — the
    standard model-monitoring drift score (<0.1 stable, >0.25 act),
    here over the same integer-bit bins histogram_quantile uses, so
    the drift monitor's state is the SAME mergeable histogram the
    quantile sketch maintains (one histogram per day serves both).
    Laplace-smoothed (+1 per bin) so empty bins cannot produce
    log-of-zero; the whole comparison reduces to a ≤ ~70-row bin
    table. The numeric-feature twin of corpus_drift_js."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_psi_sql("spark"))


# ---------------------------------------------------------------------------
# entity-level split leakage

def _hash_mod10(dialect: str, col: str) -> str:
    """First 4 md5 nibbles of ``col`` as an integer, mod 10 — the
    deterministic split assignment, identical across engines."""
    s = "string" if dialect == "spark" else "varchar"
    h = f"substr(md5(cast({col} AS {s})), 1, 4)"
    if dialect == "spark":
        return f"(cast(conv({h}, 16, 10) AS bigint) % 10)"
    return f"(cast(('0x' || {h}) AS bigint) % 10)"


def _entity_split_sql(dialect: str) -> str:
    ev_split = _hash_mod10(dialect, "event_id")
    us_split = _hash_mod10(dialect, "user_id")
    return f"""
WITH by_event AS (
    SELECT user_id,
           CASE WHEN {ev_split} < 8 THEN 'train' ELSE 'test' END AS split
    FROM events
),
event_overlap AS (
    SELECT cast(count(*) AS bigint) AS n_leaky_users FROM (
        SELECT user_id FROM by_event
        GROUP BY user_id
        HAVING count(DISTINCT split) > 1
    ) u
),
by_user AS (
    SELECT user_id,
           CASE WHEN {us_split} < 8 THEN 'train' ELSE 'test' END AS split
    FROM events GROUP BY user_id
),
user_overlap AS (
    SELECT cast(count(*) AS bigint) AS n_leaky_users FROM (
        SELECT user_id FROM by_user
        GROUP BY user_id
        HAVING count(DISTINCT split) > 1
    ) u
),
n AS (SELECT cast(count(DISTINCT user_id) AS bigint) AS n_users FROM events)
SELECT n.n_users,
       e.n_leaky_users AS leaky_users_event_split,
       round(e.n_leaky_users / cast(n.n_users AS double), 6)
           AS leak_rate_event_split,
       u.n_leaky_users AS leaky_users_entity_split
FROM n CROSS JOIN event_overlap e CROSS JOIN user_overlap u
"""


@register("entity_split_check", oracle=_entity_split_sql("duckdb"))
def entity_split_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-level split integrity: hash-splitting EVENTS sends almost
    every active user to both train and test (the leakage that inflates
    every per-user model metric), while hash-splitting USERS leaks
    nobody by construction — this check quantifies the difference on
    the same data in one row: how many users straddle the event-level
    split vs the entity-level one (provably zero). The standard audit
    before any behavioral-model split is trusted; the per-entity
    grouping is the only fact-sized shuffle. Complements
    split_leakage_check, which measures CONTENT leakage between
    document splits."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_entity_split_sql("spark"))


# ---------------------------------------------------------------------------
# item-item similarity top-k

_ITEM_TOP = 5


def _item_sim_sql(dialect: str) -> str:
    return f"""
WITH baskets AS (
    SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
freq AS (
    SELECT b, cast(count(*) AS bigint) AS n FROM baskets GROUP BY b
),
cooc AS (
    SELECT a.b AS b1, x.b AS b2, cast(count(*) AS bigint) AS n_both
    FROM baskets a JOIN baskets x ON a.ok = x.ok AND a.b <> x.b
    GROUP BY a.b, x.b
),
scored AS (
    SELECT c.b1, c.b2, c.n_both,
           round(c.n_both / sqrt(cast(fa.n AS double) * fb.n), 6) AS cosine
    FROM cooc c
    JOIN freq fa ON fa.b = c.b1
    JOIN freq fb ON fb.b = c.b2
)
SELECT b1, b2, n_both, cosine FROM (
    SELECT b1, b2, n_both, cosine,
           row_number() OVER (PARTITION BY b1
                              ORDER BY cosine DESC, b2) AS rk
    FROM scored
) ranked WHERE rk <= {_ITEM_TOP}
"""


@register("item_similarity_topk", oracle=_item_sim_sql("duckdb"))
def item_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering: top-5 most-similar brands per
    brand by co-occurrence cosine (n_both / √(n_a·n_b)) — the
    "customers also bought" primitive, and the third member of the
    basket family (pairwise lift → triangles → recommendations). Pair
    generation is bounded by basket size exactly as in
    market_basket_pairs; the similarity join touches only the
    catalog-sized co-occurrence table, and the per-item top-k window
    partitions on the item. Cosine is rounded before ranking so both
    engines order identically."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_item_sim_sql("spark"))


# ---------------------------------------------------------------------------
# consistent-hash resharding

_SHARDS_BEFORE = 8
_SHARDS_AFTER = 9


def _hrw_pick(dialect: str, key: str, n: int) -> str:
    """Rendezvous (highest-random-weight) shard pick: argmax over
    md5(shard:key) across n shards, as a greatest-of CASE chain."""
    s = "string" if dialect == "spark" else "varchar"

    def w(i: int) -> str:
        h = f"substr(md5(concat('{i}:', cast({key} AS {s}))), 1, 8)"
        if dialect == "spark":
            return f"cast(conv({h}, 16, 10) AS bigint)"
        return f"cast(('0x' || {h}) AS bigint)"

    weights = ", ".join(w(i) for i in range(n))
    picks = " ".join(
        f"WHEN greatest({weights}) = {w(i)} THEN {i}" for i in range(n)
    )
    return f"CASE {picks} END"


def _reshard_sql(dialect: str) -> str:
    hrw_b = _hrw_pick(dialect, "k", _SHARDS_BEFORE)
    hrw_a = _hrw_pick(dialect, "k", _SHARDS_AFTER)
    return f"""
WITH keys AS (SELECT DISTINCT o_custkey AS k FROM orders),
assigned AS (
    SELECT k,
           k % {_SHARDS_BEFORE} AS mod_before,
           k % {_SHARDS_AFTER} AS mod_after,
           {hrw_b} AS hrw_before,
           {hrw_a} AS hrw_after
    FROM keys
)
SELECT cast(count(*) AS bigint) AS n_keys,
       cast(sum(CASE WHEN mod_before <> mod_after THEN 1 ELSE 0 END)
            AS bigint) AS moved_mod,
       round(sum(CASE WHEN mod_before <> mod_after THEN 1 ELSE 0 END)
             / cast(count(*) AS double), 6) AS moved_mod_frac,
       cast(sum(CASE WHEN hrw_before <> hrw_after THEN 1 ELSE 0 END)
            AS bigint) AS moved_hrw,
       round(sum(CASE WHEN hrw_before <> hrw_after THEN 1 ELSE 0 END)
             / cast(count(*) AS double), 6) AS moved_hrw_frac
FROM assigned
"""


@register("consistent_hash_reshard", oracle=_reshard_sql("duckdb"))
def consistent_hash_reshard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding cost, measured: growing 8 shards to 9 moves ~8/9 of
    all keys under modulo assignment but only ~1/9 under rendezvous
    (highest-random-weight) hashing — the one-row proof of why
    stateful systems (shuffle services, KV stores, streaming state
    backends) shard by consistent hashing. Both assignments are pure
    per-row integer expressions (argmax over salted md5 weights — no
    ring data structure needed at n this small), so the comparison is
    one scan over the distinct key set and the oracle verifies every
    assignment bit-for-bit."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_reshard_sql("spark"))
