"""Extended analytics, batch 10 (round 5): operations-and-governance
queries — event-type Markov transitions (the funnel generalized to a
matrix), per-feed freshness against SLA bounds, semi-structured schema
drift over JSON payload keys, and a GDPR-erasure audit. Dual-dialect
templates; probabilities are exact-count ratios with one division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# event-type Markov transition matrix

def _markov_sql(dialect: str) -> str:
    return """
WITH ordered_ev AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS next_type
    FROM events
),
transitions AS (
    SELECT event_type AS cur, next_type AS nxt,
           cast(count(*) AS bigint) AS n
    FROM ordered_ev WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
),
row_tot AS (
    SELECT cur, cast(sum(n) AS bigint) AS tot FROM transitions GROUP BY cur
)
SELECT t.cur, t.nxt, t.n,
       t.n / cast(r.tot AS double) AS p,
       cast(rank() OVER (PARTITION BY t.cur ORDER BY t.n DESC, t.nxt)
            AS int) AS rank_in_row
FROM transitions t JOIN row_tot r ON r.cur = t.cur
"""


@register("event_markov_transitions", oracle=_markov_sql("duckdb"))
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over the per-user event
    stream — the funnel generalized: P(next event type | current),
    estimated from exact lag-pair counts. One user-keyed window pass
    (the same shuffle sessionization uses), then a type-pair aggregate
    whose size is |types|² regardless of corpus size. The matrix is
    what drives next-action prediction, funnel-leak diagnosis, and
    bot detection (bots have near-deterministic rows)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_markov_sql("spark"))


# ---------------------------------------------------------------------------
# data-freshness SLA

_SLA_BOUNDS_H = (1, 6, 24)


def _freshness_sql(dialect: str) -> str:
    us = "unix_micros" if dialect == "spark" else "epoch_us"
    flags = ",\n       ".join(
        f"lag_us <= cast({h} AS bigint) * 3600000000 AS within_{h}h"
        for h in _SLA_BOUNDS_H
    )
    return f"""
WITH feeds AS (
    -- each event type is a feed; production swaps in the ingest topic
    SELECT event_type AS feed,
           max({us}(ts)) AS last_us,
           cast(count(*) AS bigint) AS n_rows
    FROM events GROUP BY event_type
),
now_ref AS (SELECT max(last_us) AS now_us FROM feeds),
lagged AS (
    SELECT f.feed, f.n_rows, f.last_us,
           cast(n.now_us - f.last_us AS bigint) AS lag_us
    FROM feeds f CROSS JOIN now_ref n
)
SELECT feed, n_rows, last_us, lag_us,
       {flags}
FROM lagged
"""


@register("data_freshness_sla", oracle=_freshness_sql("duckdb"))
def data_freshness_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed freshness audit: the newest event time per feed, its
    lag behind the most recent feed (the reference instant — in
    production, the wall clock), and whether each SLA bound holds —
    the first dashboard every ingest platform builds, and the check
    plans/refresh.py's incremental reruns key off. Integer-microsecond
    arithmetic end to end; the per-feed reduction is the only
    fact-scale work and the SLA table is |feeds| rows at any scale."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_freshness_sql("spark"))


# ---------------------------------------------------------------------------
# JSON payload schema drift

def _schema_drift_sql(dialect: str) -> str:
    s = "string" if dialect == "spark" else "varchar"
    keys_fn = "json_object_keys" if dialect == "spark" else "json_keys"
    ex = "explode" if dialect == "spark" else "unnest"
    med = "(SELECT max(event_id) FROM events) / 2"
    return f"""
WITH payloads AS (
    -- augment the raw props with deterministically-planted optional
    -- keys so the drift is real: 'ver' on a third of rows everywhere,
    -- 'sess' only in the NEWER half (the planted schema addition)
    SELECT event_id <= {med} AS is_old,
           concat('{{"k":', cast(event_id % 100 AS {s}),
                  CASE WHEN event_id % 3 = 0
                       THEN concat(',"ver":', cast(event_id % 5 AS {s}))
                       ELSE '' END,
                  CASE WHEN event_id > {med}
                       THEN concat(',"sess":"', md5(cast(event_id AS {s})),
                                   '"')
                       ELSE '' END,
                  '}}') AS payload
    FROM events
),
keyed AS (
    SELECT is_old, {ex}({keys_fn}(payload)) AS k FROM payloads
),
per_key AS (
    SELECT k,
           cast(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS bigint) AS n_old,
           cast(sum(CASE WHEN is_old THEN 0 ELSE 1 END) AS bigint) AS n_new
    FROM keyed GROUP BY k
),
tot AS (
    SELECT cast(sum(CASE WHEN is_old THEN 1 ELSE 0 END) AS bigint) AS t_old,
           cast(sum(CASE WHEN is_old THEN 0 ELSE 1 END) AS bigint) AS t_new
    FROM payloads
)
SELECT p.k AS json_key, p.n_old, p.n_new,
       p.n_old / cast(t.t_old AS double) AS rate_old,
       p.n_new / cast(t.t_new AS double) AS rate_new,
       CASE WHEN p.n_old = 0 THEN 'added'
            WHEN p.n_new = 0 THEN 'removed'
            ELSE 'present' END AS status
FROM per_key p CROSS JOIN tot t
"""


@register("schema_drift_keys", oracle=_schema_drift_sql("duckdb"))
def schema_drift_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema drift: top-level JSON keys of the payload
    column, counted per ingest half, with presence rates and an
    added/removed/present verdict — how a raw JSONB layer (the
    reference's raw.data) is monitored for upstream producers quietly
    adding or dropping fields. Key extraction is one scan
    (json_object_keys / json_keys agree across engines); the drift
    table is |distinct keys| rows. The planted 'sess' key demonstrates
    a detected addition; production points this at consecutive
    snapshots instead of id halves."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_schema_drift_sql("spark"))


# ---------------------------------------------------------------------------
# GDPR-erasure audit

def _erasure_sql(dialect: str) -> str:
    s = "string" if dialect == "spark" else "varchar"
    return f"""
WITH erase_list AS (
    -- the deletion-request ledger: ~1/4 of users, hash-derived here
    -- (wide enough to be non-empty even at the 15-user smoke scale);
    -- production reads the actual DSAR table
    SELECT DISTINCT user_id FROM events
    WHERE substr(md5(cast(user_id AS {s})), 1, 1) IN ('0', '1', '2', '3')
),
surviving AS (
    SELECT e.user_id, e.event_type FROM events e
    LEFT JOIN erase_list d ON d.user_id = e.user_id
    WHERE d.user_id IS NULL
),
leaked AS (
    SELECT cast(count(*) AS bigint) AS n_leaked_rows FROM surviving s
    JOIN erase_list d ON d.user_id = s.user_id
),
removed AS (
    SELECT e.event_type,
           cast(count(*) AS bigint) AS n_rows_removed,
           cast(count(DISTINCT e.user_id) AS bigint) AS n_users_removed
    FROM events e JOIN erase_list d ON d.user_id = e.user_id
    GROUP BY e.event_type
)
SELECT r.event_type, r.n_rows_removed, r.n_users_removed,
       (SELECT cast(count(*) AS bigint) FROM erase_list) AS n_requests,
       (SELECT n_leaked_rows FROM leaked) AS n_leaked_rows
FROM removed r
"""


@register("gdpr_erasure_audit", oracle=_erasure_sql("duckdb"))
def gdpr_erasure_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure audit: given a deletion-request ledger, compute
    what an erasure pass removes (rows and users per event type) and —
    the part auditors actually ask for — PROVE the post-erasure table
    contains zero surviving rows for any requested user (n_leaked_rows
    is computed from the erased output itself and must be 0). Pure
    broadcast anti-join/semi-join shapes on the user key: the ledger
    is small by nature, so the audit costs one fact scan at any corpus
    size. The same plan drives the actual deletion rewrite (anti-join
    into a partition-overwrite, plans/refresh.py style)."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_erasure_sql("spark"))


# ---------------------------------------------------------------------------
# inter-event gap histogram (session-timeout calibration)


def _gap_hist_sql(dialect: str) -> str:
    us = (
        "unix_micros(ts) - unix_micros(lag(ts) OVER w)"
        if dialect == "spark"
        else "epoch_us(ts) - epoch_us(lag(ts) OVER w)"
    )
    idiv = "DIV" if dialect == "spark" else "//"
    return f"""
WITH gaps AS (
    SELECT event_type, {us} AS gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
bucketed AS (
    SELECT event_type,
           CASE WHEN gap_us < 1000000 THEN 0
                WHEN gap_us < 10000000 THEN 1
                WHEN gap_us < 100000000 THEN 2
                WHEN gap_us < 1000000000 THEN 3
                WHEN gap_us < 10000000000 THEN 4
                ELSE 5 END AS decade_bucket,
           gap_us
    FROM gaps WHERE gap_us IS NOT NULL
),
agg AS (
    SELECT event_type, decade_bucket,
           cast(count(*) AS bigint) AS n_gaps,
           cast(sum(gap_us) AS bigint) AS sum_gap_us
    FROM bucketed GROUP BY event_type, decade_bucket
)
SELECT event_type, decade_bucket, n_gaps,
       cast((n_gaps * 1000000) {idiv}
            (sum(n_gaps) OVER (PARTITION BY event_type))
            AS bigint) AS share_micro,
       sum_gap_us {idiv} n_gaps AS mean_gap_us
FROM agg
"""


@register("event_gap_histogram", oracle=_gap_hist_sql("duckdb"))
def event_gap_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of inter-event gaps per event type, bucketed by
    decimal decade (sub-second up to >10000 s) — the calibration query
    behind choosing a sessionization timeout: the session boundary
    belongs in the bucket valley. One lag window partitioned by user
    (high-cardinality → fully parallel), then an additive histogram
    whose share denominators come from a window over the ~30-row
    aggregate, not the fact table. The histogram is mergeable across
    days/executors by addition — at 100 TB this IS the stored state,
    like histogram_quantile's bins. Integer micros throughout."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_gap_hist_sql("spark"))
