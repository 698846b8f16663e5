"""Extended analytics, batch 11 (round 6): EWMA trend smoothing with
exact power-of-two weights, the two-phase threshold top-k (the pattern
that replaces a global sort at scale), and a Bloom-filter sizing sweep
that calibrates measured vs theoretical false-positive rates.

Dual-dialect templates; every comparison-relevant quantity is integer
arithmetic (micros/cents, power-of-two weights) so the engines hash
identically — the only float columns are explicitly-rounded theory
values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


def _epoch_day(dialect: str, ts: str) -> str:
    us = f"unix_micros({ts})" if dialect == "spark" else f"epoch_us({ts})"
    return f"({us} {_idiv(dialect)} 86400000000)"


# ---------------------------------------------------------------------------
# EWMA daily revenue (alpha = 1/2, 11-day support)

_EWMA_SPAN = 10  # weights 2^span .. 2^0 over the last span+1 days


def _ewma_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    day = _epoch_day(dialect, "o_orderdate")
    ex = "explode" if dialect == "spark" else "unnest"
    seq = (
        f"sequence(0, {_EWMA_SPAN})" if dialect == "spark"
        else f"range(0, {_EWMA_SPAN + 1})"
    )
    shl = (
        f"shiftleft(cast(1 AS bigint), cast({_EWMA_SPAN} - k AS int))"
        if dialect == "spark"
        else f"(cast(1 AS bigint) << cast({_EWMA_SPAN} - k AS int))"
    )
    return f"""
WITH daily AS (
    SELECT {day} AS d,
           cast(sum(cast(round(o_totalprice * 100, 0) AS bigint)) AS bigint)
               AS rev_cents
    FROM orders GROUP BY {day}
),
-- scatter: each day's revenue contributes to the EWMA of days d..d+span
-- with weight 2^(span-lag). A row-local explode plus a groupBy on the
-- target day replaces any distance-weighted window/range join — the
-- shuffle key is the day, the fan-out a constant 11.
scattered AS (
    SELECT d + k AS target_d, {shl} AS w, rev_cents
    FROM (SELECT d, rev_cents, {ex}({seq}) AS k FROM daily) fan
),
folded AS (
    SELECT target_d AS d,
           cast(sum(w * rev_cents) AS bigint) AS num,
           cast(sum(w) AS bigint) AS den
    FROM scattered GROUP BY target_d
)
SELECT f.d AS epoch_day, daily.rev_cents,
       f.num {idiv} f.den AS ewma_cents,
       f.den AS weight_sum
FROM folded f JOIN daily ON daily.d = f.d
"""


@register("ewma_daily_revenue", oracle=_ewma_sql("duckdb"))
def ewma_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted daily revenue trend (alpha=1/2, 11-day
    support): weights are exact powers of two on integer cents, so the
    smoothed series is integer-deterministic across engines — no float
    accumulation order to disagree on. The distance-weighted window is
    rewritten as a SCATTER: each day explodes into the 11 target days
    it influences (row-local, constant fan-out) and a groupBy on the
    target day folds numerator and denominator — the same partial-agg
    shuffle shape as any daily rollup, with no range join and no
    ordered window, so it scales exactly like the underlying daily
    aggregate. Days near the series start smooth over the shorter
    available prefix (weight_sum says how much)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_ewma_sql("spark"))


# ---------------------------------------------------------------------------
# two-phase threshold top-k (scalable top-k without a global sort)

_TOPK = 100


def _topk_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    # msb bucket of revenue cents: length of the binary representation —
    # pure integer, identical in both engines (histogram_quantile's trick;
    # ltrim guards against a dialect padding to type width)
    msb = "length(ltrim(bin(rev_cents), '0'))"
    shl_b = (
        "shiftleft(cast(1 AS bigint), cast(b - 1 AS int))"
        if dialect == "spark"
        else "(cast(1 AS bigint) << cast(b - 1 AS int))"
    )
    return f"""
WITH cust_rev AS (
    SELECT o_custkey,
           cast(sum(cast(round(o_totalprice * 100, 0) AS bigint)) AS bigint)
               AS rev_cents
    FROM orders GROUP BY o_custkey
),
-- phase 1: an additive msb histogram picks a conservative threshold
-- bound: the smallest power-of-two bucket such that all buckets above
-- it hold fewer than k customers. Histogram state is ~40 rows.
hist AS (
    SELECT {msb} AS b, cast(count(*) AS bigint) AS n
    FROM cust_rev GROUP BY {msb}
),
cum AS (
    SELECT b, n,
           cast(sum(n) OVER (ORDER BY b DESC
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS bigint) AS n_at_or_above
    FROM hist
),
threshold AS (
    -- floor of the CROSSING bucket: the largest b whose cumulative
    -- count (from the top) reaches k. Cumulative counts grow as b
    -- decreases, so every lower bucket also satisfies >= k — max()
    -- picks the highest such bucket; min() would degenerate to the
    -- lowest bucket's floor and admit nearly every customer.
    SELECT coalesce(max(CASE WHEN n_at_or_above >= {_TOPK}
                             THEN power_floor END),
                    cast(0 AS bigint)) AS thr
    FROM (SELECT n_at_or_above,
                 {shl_b} AS power_floor
          FROM cum) t
),
-- phase 2: exact rank only over the candidate slice (≤ k plus one
-- bucket's worth of ties-in-bucket), never the full customer set
candidates AS (
    SELECT c.o_custkey, c.rev_cents
    FROM cust_rev c, threshold t
    WHERE c.rev_cents >= t.thr
),
ranked AS (
    SELECT o_custkey, rev_cents,
           cast(row_number() OVER (ORDER BY rev_cents DESC, o_custkey)
                AS bigint) AS rk
    FROM candidates
)
SELECT rk, o_custkey, rev_cents
FROM ranked WHERE rk <= {_TOPK}
"""


@register("revenue_topk_threshold", oracle=_topk_sql("duckdb"))
def revenue_topk_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k customers by revenue WITHOUT a global sort — the two-phase
    threshold pattern that survives 100 TB: (1) an additive msb-bucket
    histogram over the per-customer aggregate (~40 mergeable rows)
    yields a conservative revenue threshold guaranteed to admit every
    true top-k member; (2) the exact row_number ranks only the filtered
    candidate slice — a few hundred rows on one task — instead of
    sorting all customers. The histogram bound is provably safe (the
    bucket floor below the k-th cumulative count) and a probe test pins
    agreement with the naive global sort. Spark's shiftleft and
    DuckDB's << are the same power-of-two floor; bucket ids come from
    binary-string length, not floating log2."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_topk_sql("spark"))


# ---------------------------------------------------------------------------
# Bloom filter sizing sweep: measured vs theoretical FPP

_FPP_K = 3
_FPP_SIZES = (2048, 8192, 32768)  # bits; 63-bit words
_FPP_CUTOFF = 400000  # build-side predicate (o_totalprice cents scale)


def _fpp_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    s = "string" if dialect == "spark" else "varchar"

    def pos(i: str, m: int) -> str:
        salted = f"md5(concat(cast({i} AS {s}), ':{m}:', cast(key AS {s})))"
        if dialect == "spark":
            return f"(cast(conv(substr({salted}, 1, 8), 16, 10) AS bigint) % {m})"
        return f"(cast(('0x' || substr({salted}, 1, 8)) AS bigint) % {m})"

    def shl(x: str) -> str:
        if dialect == "spark":
            return f"shiftleft(cast(1 AS bigint), cast({x} AS int))"
        return f"(cast(1 AS bigint) << cast({x} AS int))"

    blocks = []
    for m in _FPP_SIZES:
        probe_pos = ", ".join(f"{pos(str(i), m)} AS p{i}" for i in range(_FPP_K))
        tests = []
        for i in range(_FPP_K):
            word = f"w{m}.arr[cast(p{i} {idiv} 63 AS int) + 1]" if dialect != "spark" else f"element_at(w{m}.arr, cast(p{i} {idiv} 63 AS int) + 1)"
            tests.append(f"({word} & {shl(f'p{i} % 63')}) != 0")
        test_all = " AND ".join(tests)
        if dialect == "spark":
            words = f"SELECT explode(sequence(0, {m // 63})) AS w"
            arr = ("transform(sort_array(collect_list(named_struct("
                   "'w', w, 'bits', bits))), x -> x.bits)")
        else:
            words = f"SELECT unnest(range(0, {m // 63 + 1})) AS w"
            arr = "list(bits ORDER BY w)"
        blocks.append(f"""
bits{m} AS (
    SELECT p {idiv} 63 AS w, bit_or({shl('p % 63')}) AS bits
    FROM (SELECT {pos('i', m)} AS p
          FROM keys, (SELECT 0 AS i UNION ALL SELECT 1 UNION ALL SELECT 2) ki) kb
    GROUP BY p {idiv} 63
),
arr{m} AS (
    SELECT {arr} AS arr
    FROM (SELECT wd.w, coalesce(b.bits, cast(0 AS bigint)) AS bits
          FROM ({words}) wd LEFT JOIN bits{m} b ON b.w = wd.w) dense
),
sweep{m} AS (
    SELECT cast({m} AS bigint) AS m_bits,
           cast(count(*) AS bigint) AS n_probes,
           cast(sum(CASE WHEN {test_all} THEN 1 ELSE 0 END) AS bigint)
               AS n_candidates,
           cast(sum(is_member) AS bigint) AS n_true_members,
           cast(sum(CASE WHEN ({test_all}) AND is_member = 0
                         THEN 1 ELSE 0 END) AS bigint) AS n_false_pos
    FROM (SELECT pp.key, {probe_pos}, pp.is_member
          FROM probes pp) pp CROSS JOIN arr{m} w{m}
)""")
        # note: kb derives i via a 3-row UNION (dialect-identical) to keep
        # the per-m hash salt inline

    union = "\nUNION ALL\n".join(f"SELECT * FROM sweep{m}" for m in _FPP_SIZES)
    return f"""
WITH keys AS (
    SELECT DISTINCT o_orderkey AS key FROM orders
    WHERE cast(round(o_totalprice * 100, 0) AS bigint) > {_FPP_CUTOFF * 100}
),
n_keys_t AS (SELECT cast(count(*) AS bigint) AS n_keys FROM keys),
probes AS (
    SELECT o.o_orderkey AS key,
           CASE WHEN k.key IS NOT NULL THEN 1 ELSE 0 END AS is_member
    FROM (SELECT DISTINCT o_orderkey FROM orders) o
    LEFT JOIN keys k ON k.key = o.o_orderkey
),
{', '.join(b.strip() for b in blocks)}
SELECT sw.m_bits, nk.n_keys, sw.n_probes, sw.n_candidates,
       sw.n_true_members, sw.n_false_pos,
       (sw.n_false_pos * 1000000) {idiv}
           (sw.n_probes - sw.n_true_members) AS fpp_measured_micro,
       round(power(cast(1 AS double)
                   - exp(-cast({_FPP_K} AS double) * nk.n_keys / sw.m_bits),
                   {_FPP_K}), 6) AS fpp_theory
FROM ({union}) sw CROSS JOIN n_keys_t nk
"""


@register("bloom_fpp_calibration", oracle=_fpp_sql("duckdb"))
def bloom_fpp_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter sizing calculator: the same portable k=3 salted-md5
    filter built at three sizes (2 Kib → 32 Kib), each probed against
    the full key set, reporting measured false-positive micros next to
    the textbook (1-e^{-kn/m})^k prediction — the design sweep run
    before committing a broadcast-sketch size for a 100 TB semi-join
    (bloom_prune_semijoin is the production shape; this is its tuning
    twin, like lsh_band_tuning is to dedup_minhash_lsh). All filter
    state is word-array rows cross-joined as 1-row broadcasts; the
    only floats are the explicitly-rounded theory column."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_fpp_sql("spark"))
