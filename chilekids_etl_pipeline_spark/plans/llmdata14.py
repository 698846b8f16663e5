"""Training-data pipeline operators, batch 14 (round 7): interpolated
Kneser-Ney bigram scoring and Horvitz-Thompson estimation over a
weighted Poisson sample.

Public recipes — Kneser-Ney smoothing (Kneser & Ney 1995, the standard
n-gram LM smoothing; interpolated form per Chen & Goodman 1998) and
Horvitz-Thompson inverse-inclusion-probability estimation (the
textbook unequal-probability sampling estimator) — re-expressed as
declarative Spark plans.

Dual-dialect SQL templates; comparison-relevant quantities are exact
integer counts or floor-quantized doubles computed from exact-bigint
operands with textually identical expressions in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import words_sql
from ..sources.tables import load_table
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


def _s(dialect: str) -> str:
    return "string" if dialect == "spark" else "varchar"


def _h32(dialect: str, expr: str) -> str:
    if dialect == "spark":
        return f"cast(conv(substr(md5({expr}), 1, 8), 16, 10) AS bigint)"
    return f"cast(('0x' || substr(md5({expr}), 1, 8)) AS bigint)"


# ---------------------------------------------------------------------------
# interpolated Kneser-Ney bigram LM scoring


def _bigrams_cte(dialect: str) -> str:
    w = words_sql(dialect)
    if dialect == "spark":
        return f"""
bg AS (
    SELECT doc_id, element_at(w, i) AS w1, element_at(w, i + 1) AS w2
    FROM (SELECT doc_id, {w} AS w FROM documents)
    LATERAL VIEW explode(sequence(1, size(w) - 1)) t AS i
)"""
    return f"""
bg AS (
    SELECT doc_id, w[i] AS w1, w[i + 1] AS w2
    FROM (SELECT doc_id, {w} AS w FROM documents)
    CROSS JOIN LATERAL (SELECT unnest(range(1, len(w))) AS i) t
)"""


_KN_D_MICRO = 750_000  # absolute discount D = 0.75


def _kn_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    return f"""
WITH {_bigrams_cte(dialect).strip()},
cnt2 AS (
    SELECT w1, w2, cast(count(*) AS bigint) AS c2
    FROM bg GROUP BY w1, w2
),
cnt1 AS (
    SELECT w1, cast(sum(c2) AS bigint) AS c1,
           cast(count(*) AS bigint) AS nr   -- N1+(w1 *): distinct right
    FROM cnt2 GROUP BY w1
),
cont AS (
    SELECT w2, cast(count(*) AS bigint) AS nl  -- N1+(* w2): distinct left
    FROM cnt2 GROUP BY w2
),
types AS (SELECT cast(count(*) AS bigint) AS tt FROM cnt2),
scored AS (
    -- interpolated KN: P(w2|w1) = (c2 - D)/c1 + (D*nr/c1) * (nl/tt);
    -- every factor is a double built from exact bigints with this exact
    -- expression text in both engines, then floor-quantized
    SELECT bg.doc_id,
           cast(floor(-1000000.0 * ln(
               (cast(c.c2 AS double) - 0.75) / cast(u.c1 AS double)
               + (0.75 * cast(u.nr AS double) / cast(u.c1 AS double))
                 * (cast(n.nl AS double) / cast(t.tt AS double))
           )) AS bigint) AS neg_logp_micro
    FROM bg
    JOIN cnt2 c ON c.w1 = bg.w1 AND c.w2 = bg.w2
    JOIN cnt1 u ON u.w1 = bg.w1
    JOIN cont n ON n.w2 = bg.w2
    CROSS JOIN types t
)
SELECT doc_id, cast(count(*) AS bigint) AS n_bigrams,
       cast(sum(neg_logp_micro) AS bigint) AS sum_neg_logp_micro,
       cast(sum(neg_logp_micro) AS bigint) {idiv} count(*)
           AS avg_neg_logp_micro
FROM scored GROUP BY doc_id
"""


@register("kneser_ney_bigram", oracle=_kn_sql("duckdb"))
def kneser_ney_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scoring — the smoothing that made
    n-gram LMs competitive (absolute discount D=0.75 with the
    CONTINUATION-count backoff: P_cont(w) counts how many distinct
    contexts w follows, not how often w occurs), here as the per-doc
    perplexity-style quality score that complements bigram_lm_score's
    Laplace baseline. Three mergeable count tables (bigram, context +
    distinct-right, distinct-left) and a 1-row type count; scoring joins
    shuffle on the bigram/word keys exactly like any corpus-statistics
    weighting. Per-bigram -ln P is floor-quantized to micros BEFORE the
    per-doc sum, so the distributed aggregation is exact-bigint and
    engine addition order cannot show. Every count the discount
    arithmetic needs is a broadcast-scale table at any corpus size;
    nothing is per-doc-pair."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_kn_sql("spark"))


# ---------------------------------------------------------------------------
# Horvitz-Thompson estimation over a weighted Poisson sample


_HT_EXPECTED = 200  # expected sample size (k in p_i = k*w_i/W)


def _ht_sql(dialect: str) -> str:
    s = _s(dialect)
    w = words_sql(dialect)
    nw = f"size({w})" if dialect == "spark" else f"len({w})"
    h = _h32(dialect, f"concat(cast(doc_id AS {s}), ':ht')")
    idiv = _idiv(dialect)
    k = _HT_EXPECTED
    return f"""
WITH base AS (
    SELECT doc_id, source, cast(n_chars AS bigint) AS wgt,
           cast({nw} AS bigint) AS tokens,
           1 + ({h} % 999999) AS u_micro
    FROM documents
),
tot AS (SELECT cast(sum(wgt) AS bigint) AS big_w FROM base),
-- weighted Poisson sampling: include iff u < p_i, p_i = min(1, k*w/W);
-- the comparison is pure bigint (u_micro * W < k * w * 1e6), no doubles
sampled AS (
    SELECT b.doc_id, b.source, b.wgt, b.tokens, t.big_w,
           CASE WHEN {k} * b.wgt * 1000000 >= t.big_w * 1000000
                THEN 1000000
                ELSE cast(({k} * b.wgt * 1000000) {idiv} t.big_w AS bigint)
           END AS p_micro
    FROM base b CROSS JOIN tot t
    WHERE b.u_micro * t.big_w < {k} * b.wgt * 1000000
         OR {k} * b.wgt >= t.big_w
),
-- HT terms floor-quantized per row, then exact bigint sums per source
terms AS (
    SELECT source,
           cast(floor(1000000.0 * 1000000.0 / cast(p_micro AS double))
                AS bigint) AS inv_p_micro,
           cast(floor(1000000.0 * cast(tokens AS double) * 1000000.0
                      / cast(p_micro AS double)) AS bigint)
               AS tok_ht_micro
    FROM sampled
),
est AS (
    SELECT source, cast(count(*) AS bigint) AS n_sampled,
           cast(sum(inv_p_micro) AS bigint) {idiv} 1000000 AS est_docs,
           cast(sum(tok_ht_micro) AS bigint) {idiv} 1000000 AS est_tokens
    FROM terms GROUP BY source
),
truth AS (
    SELECT source, cast(count(*) AS bigint) AS true_docs,
           cast(sum(tokens) AS bigint) AS true_tokens
    FROM base GROUP BY source
)
SELECT e.source, e.n_sampled, e.est_docs, t.true_docs,
       e.est_tokens, t.true_tokens,
       (1000000 * abs(e.est_tokens - t.true_tokens))
           {idiv} greatest(t.true_tokens, 1) AS tok_rel_err_micro
FROM est e JOIN truth t ON t.source = e.source
"""


@register("importance_weighted_stats", oracle=_ht_sql("duckdb"))
def importance_weighted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson corpus estimation from a weighted Poisson
    sample — the debiasing half of weighted sampling: include doc i
    with probability p_i ∝ its char weight (deterministic hash uniform,
    pure-bigint inclusion test), then estimate per-source document and
    token totals as Σ x_i/p_i over the SAMPLE ONLY, compared against
    the true totals the oracle also states. This is how a 100 TB corpus
    reports its statistics from a 0.1% profile scan without bias —
    length-biased inclusion corrected exactly by the inverse
    probability. One scan + a 1-row total-weight broadcast; HT terms are
    floor-quantized micros so the per-source sums are exact bigints.
    The truth side is a second aggregate over the same scan (here for
    verification; production reports the estimates alone)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_ht_sql("spark"))
