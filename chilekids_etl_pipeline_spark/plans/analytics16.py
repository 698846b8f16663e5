"""Analytics operators, batch 16 (round 7): burst detection, referential
integrity audit, winsorized segment stats, and session entropy profile.

Public recipes as declarative Spark plans:

- Trailing z-score burst detection on fixed event-time buckets — the
  ops-monitoring staple (spike = count far above its trailing window).
- Referential-integrity matrix: orphan rates across every FK edge of
  the star schema in one audit table (the dbt `relationships` test
  generalized to a single sweep).
- Winsorized statistics (Tukey; robust-stats textbook): clamp at exact
  nearest-rank P5/P95 per segment, compare robust vs raw mean.
- Per-user session entropy (Shannon) over event types, bucketed into a
  behavioral-diversity histogram.

Dual-dialect SQL templates; every cross-row float sum is floor-quantized
to integer micros per row first (order-proof exact-bigint aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


def _epoch(dialect: str, col: str) -> str:
    if dialect == "spark":
        return f"cast(unix_timestamp({col}) AS bigint)"
    return f"cast(floor(epoch({col})) AS bigint)"


# ---------------------------------------------------------------------------
# trailing z-score burst detection


_BURST_BUCKET_S = 600
_BURST_WINDOW = 12  # trailing 2 hours of 10-min buckets


def _burst_sql(dialect: str) -> str:
    ep = _epoch(dialect, "ts")
    w = _BURST_WINDOW
    return f"""
WITH buckets AS (
    SELECT ({ep} {_idiv(dialect)} {_BURST_BUCKET_S}) AS bucket,
           cast(count(*) AS bigint) AS cnt
    FROM events GROUP BY 1
),
trail AS (
    -- exact-bigint trailing sums over the PRESENT buckets (index-based
    -- trailing window; a silent-gap bucket contributes no row, which an
    -- ops monitor treats as its own alert class, not as zero traffic)
    SELECT bucket, cnt,
           cast(sum(cnt) OVER tw AS bigint) AS s1,
           cast(sum(cnt * cnt) OVER tw AS bigint) AS s2,
           cast(count(*) OVER tw AS bigint) AS m
    FROM buckets
    WINDOW tw AS (ORDER BY bucket
                  ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING)
),
scored AS (
    -- mean/var from exact integer sums; the only float ops are one
    -- division and one sqrt (both IEEE exactly-rounded), then the
    -- z-score is floor-quantized before any ordering
    SELECT bucket, cnt, m,
           (s1 * 1000000) {_idiv(dialect)} m AS mean_micro,
           cast(floor(1000000.0 * (cnt - s1 / cast(m AS double))
                      / sqrt((s2 - s1 * (s1 / cast(m AS double)))
                             / cast(m - 1 AS double))) AS bigint) AS z_micro
    FROM trail
    WHERE m = {w}
      AND (s2 * m) > (s1 * s1)
)
SELECT bucket, cnt, mean_micro, z_micro,
       CASE WHEN z_micro >= 3000000 THEN 1 ELSE 0 END AS is_burst
FROM scored
ORDER BY z_micro DESC, bucket
LIMIT 20
"""


@register("event_burst_zscore", oracle=_burst_sql("duckdb"))
def event_burst_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burst detection on 10-minute event buckets: each full-history
    bucket is scored against the mean/stddev of its trailing 12 buckets
    (exact integer sum/sum-of-squares over a rows-window), and the top
    20 z-scores are reported with a 3-sigma burst flag. One grouped scan
    builds the bucket series (map-side combinable); the trailing window
    and final top-k run over the BUCKET series — tens of thousands of
    rows at 100 TB, metadata-scale. Companions: events_value_outliers
    (per-event value z-scores), anomaly_mad_robust (daily MAD),
    event_gap_histogram (silence detection)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_burst_sql("spark"))


# ---------------------------------------------------------------------------
# referential-integrity matrix


_FK_EDGES = (
    ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("lineitem.l_partkey->part", "lineitem", "l_partkey",
     "part", "p_partkey"),
    ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey",
     "supplier", "s_suppkey"),
    ("orders.o_custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("customer.c_nationkey->nation", "customer", "c_nationkey",
     "nation", "n_nationkey"),
    ("supplier.s_nationkey->nation", "supplier", "s_nationkey",
     "nation", "n_nationkey"),
    ("nation.n_regionkey->region", "nation", "n_regionkey",
     "region", "r_regionkey"),
    ("events.user_id->customer", "events", "user_id",
     "customer", "c_custkey"),
)


def _ri_edge_sql(dialect: str, edge: tuple[str, str, str, str, str]) -> str:
    name, child, ck, parent, pk = edge
    idiv = _idiv(dialect)
    return f"""
SELECT '{name}' AS edge,
       cast(count(*) AS bigint) AS child_rows,
       cast(count(DISTINCT c.{ck}) AS bigint) AS child_keys,
       cast(sum(CASE WHEN c.{ck} IS NULL THEN 1 ELSE 0 END) AS bigint)
           AS null_keys,
       cast(sum(CASE WHEN c.{ck} IS NOT NULL AND p.{pk} IS NULL
                THEN 1 ELSE 0 END) AS bigint) AS orphan_rows,
       (cast(sum(CASE WHEN c.{ck} IS NOT NULL AND p.{pk} IS NULL
                 THEN 1 ELSE 0 END) AS bigint) * 1000000)
           {idiv} count(*) AS orphan_rate_micro
FROM {child} c LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p
    ON c.{ck} = p.{pk}
"""


def _ri_sql(dialect: str) -> str:
    parts = "\nUNION ALL\n".join(
        _ri_edge_sql(dialect, e).strip() for e in _FK_EDGES
    )
    return f"SELECT * FROM (\n{parts}\n) ORDER BY edge"


@register("referential_integrity_audit", oracle=_ri_sql("duckdb"))
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sweep referential-integrity matrix: every FK edge of the star
    schema (8 edges) audited for row count, distinct child keys, NULL
    keys, orphan rows, and orphan rate — the dbt `relationships` test
    generalized into a single audit table a data-contract check gates
    on. Each edge is a LEFT JOIN against the DISTINCT parent keys:
    dimension sides broadcast (nation/region/customer/part/supplier are
    the small sides), so the big fact scans never shuffle on the fact
    side; at 100 TB each edge is one broadcast-hash pass over its child
    table. Companions: dq_expectations (column-level contracts),
    schema_drift_keys (structural drift).

    r12 note — fusing the three lineitem edges into ONE scan (three
    broadcast probes + three count-distincts unpivoted via stack()) was
    built, oracle-verified, and A/B-REVERTED: 2.44 → 3.61 s median,
    worse 3/3 alternating rounds (AB_r12_ri_audit.json). The
    multi-distinct Expand (4x the row set into one exchange) and the
    triple probe per row cost more than the two extra scans, which run
    as independent racing stages; shuffle bytes at scale are comparable
    either way because two-phase distinct partial-aggregates map-side
    in both forms."""
    for t in ("lineitem", "orders", "customer", "supplier",
              "nation", "region", "part", "events"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_ri_sql("spark"))


# ---------------------------------------------------------------------------
# winsorized segment statistics


def _winsor_sql(dialect: str, j_src: str | None = None) -> str:
    """``j_src`` would let the Spark side persist the orders⋈customer
    join; measured SLOWER at sf1 (see the entry docstring), kept as a
    seam for layouts where the join is genuinely expensive."""
    idiv = _idiv(dialect)
    j_body = (
        f"SELECT * FROM {j_src}" if j_src else
        "SELECT c.c_mktsegment AS seg, o.o_totalprice AS p, o.o_orderkey\n"
        "    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    )
    return f"""
WITH j AS (
    {j_body}
),
stats AS (
    SELECT seg, cast(count(*) AS bigint) AS n FROM j GROUP BY seg
),
ranked AS (
    SELECT seg, p,
           row_number() OVER (PARTITION BY seg
                              ORDER BY p, o_orderkey) AS rn
    FROM j
),
cuts AS (
    -- exact nearest-rank P5/P95 (ceil(q*n)), not interpolated: the cut
    -- is a value that EXISTS in the data, identical in any engine
    SELECT r.seg,
           max(CASE WHEN r.rn = greatest(cast(ceil(0.05 * s.n) AS bigint), 1)
               THEN r.p END) AS lo_p,
           max(CASE WHEN r.rn = cast(ceil(0.95 * s.n) AS bigint)
               THEN r.p END) AS hi_p
    FROM ranked r JOIN stats s ON r.seg = s.seg
    GROUP BY r.seg
)
SELECT j.seg, s.n,
       cast(floor(1000000.0 * c.lo_p) AS bigint) AS lo_micro,
       cast(floor(1000000.0 * c.hi_p) AS bigint) AS hi_micro,
       cast(sum(cast(floor(1000000.0 * p) AS bigint)) AS bigint)
           {idiv} s.n AS raw_mean_micro,
       cast(sum(cast(floor(1000000.0 *
                 least(greatest(j.p, c.lo_p), c.hi_p)) AS bigint)) AS bigint)
           {idiv} s.n AS winsor_mean_micro
FROM j JOIN cuts c ON j.seg = c.seg JOIN stats s ON j.seg = s.seg
GROUP BY j.seg, s.n, c.lo_p, c.hi_p
ORDER BY j.seg
"""


@register("winsorized_segment_stats", oracle=_winsor_sql("duckdb"))
def winsorized_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized vs raw mean order value per market segment: clamp at
    the exact nearest-rank P5/P95 inside each segment, then compare the
    robust mean against the raw mean (the gap measures tail influence).
    The rank window shuffles once on the segment key — the standard
    per-group sequencing shape; the clamp cut-points join back as a
    5-row broadcast. Per-row values are floor-quantized to micros before
    the segment sums, so the means are exact integers. Nearest-rank (not
    interpolated) quantiles guarantee the cut is a real data value and
    cross-engine identical. The template references ``j`` three times;
    persisting it was A/B-tested and REJECTED (idle sf1, alternating
    runs: no-persist 3.4-4.0 s vs persist 4.1-4.4 s — caching 1.5M rows
    costs more than re-running the broadcast join, which re-reads a
    single pruned parquet column). Companions: order_value_percentiles
    (approx-quantile profile), anomaly_mad_robust (MAD outliers),
    feature_scaling (z/minmax normalization)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_winsor_sql("spark"))


# ---------------------------------------------------------------------------
# session entropy profile


def _entropy_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    return f"""
WITH per_type AS (
    SELECT user_id, event_type, cast(count(*) AS bigint) AS c
    FROM events GROUP BY user_id, event_type
),
per_user AS (
    SELECT user_id, cast(sum(c) AS bigint) AS tot FROM per_type GROUP BY user_id
),
contrib AS (
    -- each type's p*ln(1/p) term floor-quantized to micros BEFORE the
    -- per-user sum: entropy is an exact-bigint accumulation
    SELECT t.user_id,
           cast(floor(1000000.0 * (t.c / cast(u.tot AS double))
                      * ln(cast(u.tot AS double) / t.c)) AS bigint)
               AS h_micro
    FROM per_type t JOIN per_user u ON t.user_id = u.user_id
),
user_h AS (
    SELECT c.user_id, cast(sum(c.h_micro) AS bigint) AS entropy_micro,
           max(u.tot) AS n_events
    FROM contrib c JOIN per_user u ON c.user_id = u.user_id
    GROUP BY c.user_id
)
SELECT entropy_micro {idiv} 100000 AS h_bucket,
       cast(count(*) AS bigint) AS n_users,
       cast(min(entropy_micro) AS bigint) AS min_h_micro,
       cast(max(entropy_micro) AS bigint) AS max_h_micro,
       cast(sum(entropy_micro) AS bigint) {idiv} count(*) AS avg_h_micro,
       cast(sum(n_events) AS bigint) AS events_covered
FROM user_h
GROUP BY 1
ORDER BY h_bucket
"""


@register("session_entropy", oracle=_entropy_sql("duckdb"))
def session_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral-diversity histogram: Shannon entropy of each user's
    event-type distribution (exact micro-nat bigints — each type's
    p·ln(1/p) term is floor-quantized before the per-user sum), bucketed
    at 0.1-nat width with per-bucket user counts and entropy ranges.
    Two grouped passes — (user, type) then user — both map-side
    combinable, then a histogram over users; no windows, no per-event
    state. A bot-detection gate reads this: near-zero entropy at high
    event count is scripted traffic. Companions: event_markov_transitions
    (sequence structure), session_path_topk (common paths),
    customer_churn_flag (activity recency)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_entropy_sql("spark"))
