"""Extended analytics, batch 6: time-weighted averaging over event
intervals, per-key hourly gap-fill with carry-forward (the sparse → dense
time-series step), point-in-time joins against SCD-2 validity intervals,
and a join-key skew profile (the diagnostic that decides when a join
needs salting).

Dual-dialect SQL templates as in plans/analytics.py..analytics5.py; all
timestamp arithmetic is integer microseconds so the oracle hashes match
exactly. Registered after the current external-gate window — imported
last in plans.load_all(), rotating into the window next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# time-weighted average (TWAP)

def _epoch_us(dialect: str, ts: str) -> str:
    if dialect == "spark":
        return f"unix_micros({ts})"
    return f"epoch_us({ts})"


def _twap_sql(dialect: str) -> str:
    us = _epoch_us(dialect, "ts")
    next_us = _epoch_us(dialect, "lead(ts) OVER w")
    return f"""
WITH stamped AS (
    SELECT user_id, value,
           {us} AS t_us,
           {next_us} AS t_next_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
held AS (
    -- value fixed to decimal(18,6) so BOTH averages below are sums of
    -- exact decimals: a plain double avg() diverged between engines at
    -- the 6th decimal once groups hit sf1 size (order-dependent
    -- summation), and value*hold_us as double carries the same risk.
    -- (19,6) x hold_us(14,0) -> (33,6): inside precision 38, exact in
    -- both engines; precision 19 (not 18) forces DuckDB onto int128
    -- arithmetic — at p<=18 it multiplies in int64 and overflows.
    SELECT user_id, cast(value AS decimal(19,6)) AS value_dec,
           cast(t_next_us - t_us AS decimal(14,0)) AS hold_us
    FROM stamped WHERE t_next_us IS NOT NULL
)
SELECT user_id,
       cast(count(*) AS bigint) AS n_intervals,
       cast(sum(cast(hold_us AS bigint)) AS bigint) AS span_us,
       round(cast(sum(value_dec * hold_us) AS double)
             / cast(sum(cast(hold_us AS bigint)) AS double), 6) AS twap,
       round(cast(sum(value_dec) AS double) / count(*), 6) AS plain_avg
FROM held GROUP BY user_id
"""


@register("time_weighted_avg", oracle=_twap_sql("duckdb"))
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of the event value per user: each reading
    is held until the next one, so the mean is weighted by holding time
    in exact integer microseconds — the correct aggregate for
    irregularly-sampled gauges (price, queue depth, battery level)
    where the plain average over-weights bursts. One window pass
    (lead over the user partition — same shuffle the sessionizer uses)
    and one aggregation; weights are int64 microseconds so only the
    final division is floating point. Named-WINDOW syntax parses
    identically in Spark and DuckDB."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_twap_sql("spark"))


# ---------------------------------------------------------------------------
# hourly gap-fill with carry-forward

_GAP_USER_MOD = 5  # bound the dense grid to 1/5 of users


def _gap_fill_sql(dialect: str) -> str:
    if dialect == "spark":
        grid = ("SELECT user_id, "
                "explode(sequence(h0, h1, interval 1 hour)) AS h FROM span")
        carry = ("last_value(v) IGNORE NULLS OVER "
                 "(PARTITION BY user_id ORDER BY h "
                 "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    else:
        grid = ("SELECT user_id, "
                "unnest(generate_series(h0, h1, interval 1 hour)) AS h "
                "FROM span")
        carry = ("last_value(v IGNORE NULLS) OVER "
                 "(PARTITION BY user_id ORDER BY h "
                 "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")
    return f"""
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS h,
           round(sum(value), 6) AS v,
           cast(count(*) AS bigint) AS n_events
    FROM events WHERE user_id % {_GAP_USER_MOD} = 0
    GROUP BY user_id, date_trunc('hour', ts)
),
span AS (
    SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY user_id
),
grid AS ({grid}),
joined AS (
    SELECT g.user_id, g.h, hourly.v, hourly.n_events
    FROM grid g LEFT JOIN hourly
      ON hourly.user_id = g.user_id AND hourly.h = g.h
)
SELECT user_id, h,
       coalesce(n_events, 0) AS n_events,
       {carry} AS v_filled,
       v IS NULL AS is_gap
FROM joined
"""


@register("gap_fill_forward", oracle=_gap_fill_sql("duckdb"))
def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse → dense hourly series per user: generate the full hour
    grid between each user's first and last active hour (sequence
    explode — per-key generation, no global calendar cross join) and
    carry the last observed hourly value forward across gaps
    (last_value IGNORE NULLS over the user partition). This is the
    standard prep for downstream window models that assume regular
    sampling. The grid is generated per key so its size is
    sum-of-active-spans, not users × calendar; the only shuffles are
    the hourly rollup and the user-partitioned window, both on
    user_id. The IGNORE NULLS placement is the one real dialect split
    (Spark: after the call; DuckDB: inside the argument list)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_gap_fill_sql("spark"))


# ---------------------------------------------------------------------------
# point-in-time join against SCD-2 intervals

def _pit_sql(dialect: str) -> str:
    return f"""
WITH scd AS (
    SELECT user_id,
           value AS attr_value,
           ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS valid_to
    FROM events WHERE event_type = 'purchase'
),
facts AS (
    SELECT event_id, user_id, ts
    FROM events WHERE event_type = 'view'
)
SELECT f.event_id, f.user_id, f.ts,
       round(s.attr_value, 6) AS attr_value,
       s.valid_from
FROM facts f
JOIN scd s
  ON s.user_id = f.user_id
 AND f.ts >= s.valid_from
 AND (s.valid_to IS NULL OR f.ts < s.valid_to)
"""


@register("scd2_point_in_time", oracle=_pit_sql("duckdb"))
def scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join of a fact stream against SCD-2
    validity intervals: each view event picks the purchase-derived
    attribute version valid at its timestamp — the read side of the
    scd2_history entry, and the join every ML feature store must get
    right to avoid training-serving leakage. Spark plans the equi-key
    (user_id) as a hash/sort-merge join and applies the interval
    predicate as a post-join filter inside the same stage; because
    validity intervals partition time per key, each fact matches at
    most one version, so output size equals the matched-fact count.
    At 100 TB both sides shuffle once on user_id and the per-key merge
    is linear."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_pit_sql("spark"))


# ---------------------------------------------------------------------------
# join-key skew profile

def _skew_sql(dialect: str) -> str:
    if dialect == "spark":
        pct = "percentile(c, {q})"
    else:
        pct = "quantile_cont(c, {q})"
    p50 = pct.format(q="0.5")
    p90 = pct.format(q="0.9")
    p99 = pct.format(q="0.99")
    return f"""
WITH per_key AS (
    SELECT o_custkey AS k, cast(count(*) AS bigint) AS c
    FROM orders GROUP BY o_custkey
)
SELECT cast(count(*) AS bigint) AS n_keys,
       cast(sum(c) AS bigint) AS n_rows,
       cast(max(c) AS bigint) AS max_per_key,
       round(max(c) / cast(sum(c) AS double), 6) AS top1_share,
       round({p50}, 4) AS p50,
       round({p90}, 4) AS p90,
       round({p99}, 4) AS p99,
       round(max(c) / {p50}, 4) AS skew_factor
FROM per_key
"""


@register("join_skew_profile", oracle=_skew_sql("duckdb"))
def join_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-distribution profile for a join/aggregation key: row count
    per key reduced to max, exact interpolated percentiles, the
    top-1-key share, and skew_factor = max/p50 — the number that
    decides whether a shuffle needs salting or AQE skew-join handling
    BEFORE the 100 TB job runs (skewed_agg_salted and
    skewed_join_salted are the remediations this diagnostic triggers).
    One map-side-combined count per key, then a single-row reduction;
    Spark `percentile` and DuckDB `quantile_cont` are both exact
    linear interpolation, the same pairing order_value_percentiles
    has kept green since round 2."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_skew_sql("spark"))
