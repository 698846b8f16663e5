"""Round-4 analytics: salted skew-join, multi-touch attribution, and an
iterative graph algorithm (unrolled PageRank) — three execution shapes a
100 TB warehouse needs beyond plain join/agg:

- joins whose key distribution is pathological (a handful of hot keys);
- event-sequence credit assignment (window arithmetic over an interval
  join, the marketing twin of the as-of family);
- fixed-point iteration expressed as a bounded chain of join+aggregate
  rounds, with INTEGER micro-unit arithmetic so every engine computes
  bit-identical ranks (double SUM order is not portable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# salted join on a skewed key

_JOIN_SALT = 16

_SKEWED_JOIN_ORACLE = """
WITH dim AS (
    SELECT DISTINCT event_type,
           CASE WHEN event_type IN ('view', 'click') THEN 'engagement'
                ELSE 'conversion' END AS category,
           length(event_type) AS multiplier
    FROM events
)
SELECT d.category,
       cast(count(*) AS bigint) AS n,
       cast(round(sum(cast(cast(e.value AS decimal(10,2)) * d.multiplier
                           AS decimal(18,2))), 2) AS double) AS weighted_value
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY d.category
"""


@register("skewed_join_salted", oracle=_SKEWED_JOIN_ORACLE)
def skewed_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A fact-to-dim join on a 5-value key is maximal join skew: every hot
    key's rows land on one reducer. The salted decomposition replicates
    the (tiny) dim side across N sub-keys and salts the fact side
    deterministically, so each hot key spreads over N reducers — the
    identical result to the plain join, which is what the oracle states.
    (With a broadcastable dim, broadcast wins — the salt pattern is for
    when BOTH sides are too big to broadcast; the dim here stands in.)"""
    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            F.when(F.col("event_type").isin("view", "click"), "engagement")
            .otherwise("conversion")
            .alias("category"),
            F.length("event_type").alias("multiplier"),
        )
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(_JOIN_SALT - 1)))
    )
    fact = ev.withColumn("salt", (F.col("event_id") % _JOIN_SALT).cast("int"))
    joined = fact.join(dim_salted, ["event_type", "salt"])
    return (
        joined.groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(
                    (
                        F.col("value").cast("decimal(10,2)") * F.col("multiplier")
                    ).cast("decimal(18,2)")
                ),
                2,
            )
            .cast("double")
            .alias("weighted_value"),
        )
    )


# ---------------------------------------------------------------------------
# multi-touch attribution (U-shaped credit over the view→purchase window)

_ATTR_WINDOW_MIN = 60


def _attribution_sql(dialect: str) -> str:
    interval = (
        f"INTERVAL {_ATTR_WINDOW_MIN} MINUTE"
        if dialect == "spark"
        else f"INTERVAL {_ATTR_WINDOW_MIN} MINUTES"
    )
    return f"""
WITH purchases AS (
    SELECT event_id AS purchase_id, user_id, ts AS pts
    FROM events WHERE event_type = 'purchase'
),
views AS (
    SELECT event_id AS view_id, user_id, ts AS vts
    FROM events WHERE event_type = 'view'
),
touches AS (
    SELECT p.purchase_id, v.view_id,
           row_number() OVER (PARTITION BY p.purchase_id
                              ORDER BY v.vts, v.view_id) AS pos,
           count(*) OVER (PARTITION BY p.purchase_id) AS n_touches
    FROM purchases p
    JOIN views v
      ON v.user_id = p.user_id
     AND v.vts >= p.pts - {interval} AND v.vts < p.pts
)
SELECT purchase_id, view_id, pos, cast(n_touches AS bigint) AS n_touches,
       CASE WHEN n_touches = 1 THEN cast(1.0 AS double)
            WHEN n_touches = 2 THEN cast(0.5 AS double)
            WHEN pos = 1 THEN cast(0.4 AS double)
            WHEN pos = n_touches THEN cast(0.4 AS double)
            ELSE 0.2 / (n_touches - 2) END AS credit
FROM touches
"""


@register("multi_touch_attribution", oracle=_attribution_sql("duckdb"))
def multi_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: every view in
    the hour before a purchase gets credit — 40% first touch, 40% last,
    the middle 20% split evenly. The user-keyed equi-join bounds the
    interval probe to one user's events (the per-user fan-in is small by
    construction at any corpus size), and the window functions run inside
    the purchase partition — one shuffle on user_id, one on purchase_id.
    Credits are exact rationals of small ints: engine-portable."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_attribution_sql("spark"))


# ---------------------------------------------------------------------------
# unrolled PageRank over a synthesized domain link graph

_PR_NODES = 37
_PR_SCALE = 1_000_000_000_000  # rank micro-units
_PR_ITERS = 3


_PR_EDGES = """
    SELECT cast(doc_id % {n} AS bigint) AS src,
           cast((doc_id * 7 + 3) % {n} AS bigint) AS dst,
           cast(count(*) AS bigint) AS weight
    FROM documents
    GROUP BY doc_id % {n}, (doc_id * 7 + 3) % {n}
"""


def _pagerank_sql(dialect: str) -> str:
    # NOTE: persisting the edge aggregate was A/B'd and MEASURED SLOWER
    # (r5: inline 1.16 s vs persisted 1.57 s median at sf0.1) — unlike
    # cooccurrence_pmi, the re-computed subtree here is a tiny 37x37
    # aggregate over a small scan, so the cache-build barrier costs
    # more than seven cheap rescans; the wall is AQE job rounds over
    # the 3-iteration join chain, not recompute. The edges CTE stays
    # inline.
    div = (
        (lambda a, b: f"(({a}) DIV ({b}))")
        if dialect == "spark"
        else (lambda a, b: f"(({a}) // ({b}))")
    )
    teleport = _PR_SCALE * 15 // 100 // _PR_NODES
    iters = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        iters.append(
            f"""contrib{i} AS (
    SELECT e.dst, cast(sum({div(f'r.rank_u * e.weight', 'o.out_w')}) AS bigint)
        AS inc
    FROM edges e
    JOIN {prev} r ON r.domain = e.src
    JOIN out_deg o ON o.src = e.src
    GROUP BY e.dst
),
r{i} AS (
    SELECT n.domain,
           cast({teleport} + {div('coalesce(c.inc, 0) * 85', '100')} AS bigint)
               AS rank_u
    FROM nodes n LEFT JOIN contrib{i} c ON c.dst = n.domain
)"""
        )
        prev = f"r{i}"
    chain = ",\n".join(iters)
    edges_body = _PR_EDGES.format(n=_PR_NODES)
    return f"""
WITH edges AS ({edges_body}),
nodes AS (
    SELECT DISTINCT src AS domain FROM edges
    UNION SELECT DISTINCT dst FROM edges
),
out_deg AS (SELECT src, cast(sum(weight) AS bigint) AS out_w FROM edges GROUP BY src),
r0 AS (
    SELECT domain, cast({_PR_SCALE // _PR_NODES} AS bigint) AS rank_u FROM nodes
),
{chain}
SELECT n.domain,
       cast(coalesce(i.in_w, 0) AS bigint) AS in_w,
       cast(coalesce(o.out_w, 0) AS bigint) AS out_w,
       r.rank_u / cast({_PR_SCALE} AS double) AS authority
FROM nodes n
JOIN {prev} r ON r.domain = n.domain
LEFT JOIN out_deg o ON o.src = n.domain
LEFT JOIN (SELECT dst, cast(sum(weight) AS bigint) AS in_w FROM edges
           GROUP BY dst) i ON i.dst = n.domain
"""


@register("domain_authority", oracle=_pagerank_sql("duckdb"))
def domain_authority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the (synthesized) domain link graph, three damped
    power-iteration rounds unrolled as join+aggregate stages — the
    fixed-point-iteration execution shape (connected components, label
    propagation, authority scores) as one Catalyst DAG. Rank mass lives
    in INTEGER micro-units: floor division and integer sums are exact in
    every engine, where a double implementation diverges in the last bits
    by mere aggregation order. Each round shuffles on dst — at cluster
    scale the edge list is partitioned by src once and reused. NOT
    persisted: the edge aggregate is 37x37, so the persist barrier
    measured slower than recompute (see _pagerank_sql note); the
    residual wall is per-job overhead on the deep chain, a local-mode
    floor that amortizes at real scale."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_pagerank_sql("spark"))
