"""Training-data pipeline operators, batch 17 (round 7): corpus entropy
rate per language.

Public recipe: the information-theoretic corpus profile (Shannon 1951's
entropy-of-printed-English measurement, applied corpus-side) — unigram
entropy H(W), bigram entropy H(W₁W₂), and the conditional (per-token
given previous) entropy H(W₂|W₁) = H(W₁W₂) − H(W). Curation teams read
these to spot degenerate text: repetitive/boilerplate corpora sit far
below natural-language conditional entropy, while encrypted or
random-noise shards sit near the uniform ceiling ln(V).

Dual-dialect SQL template; every p·ln(1/p) term is floor-quantized to
integer micro-nats per n-gram BEFORE the per-language sum, so the
distributed aggregation is exact-bigint and order-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import words_sql
from ..sources.tables import load_table
from .registry import register


def _entropy_rate_sql(dialect: str) -> str:
    w = words_sql(dialect)
    if dialect == "spark":
        toks = """
toks AS (
    SELECT lang, pe.i, pe.tok
    FROM words LATERAL VIEW posexplode(w) pe AS i, tok
)"""
    else:
        toks = """
toks AS (
    SELECT lang, u.i, w[u.i + 1] AS tok
    FROM words, LATERAL (SELECT unnest(range(0, len(w))) AS i) u
)"""
    if dialect == "spark":
        bigrams = """
bigrams AS (
    SELECT lang, concat(element_at(w, i + 1), ' ', element_at(w, i + 2))
               AS bg
    FROM words LATERAL VIEW explode(sequence(0, size(w) - 2)) t AS i
    WHERE size(w) >= 2
)"""
    else:
        bigrams = """
bigrams AS (
    SELECT lang, w[u.i + 1] || ' ' || w[u.i + 2] AS bg
    FROM words, LATERAL (SELECT unnest(range(0, len(w) - 1)) AS i) u
    WHERE len(w) >= 2
)"""
    # per-term floor-quantized micro-nat contributions, summed as bigints
    return f"""
WITH words AS (SELECT lang, {w} AS w FROM documents),
{toks.strip()},
{bigrams.strip()},
uni AS (
    SELECT lang, tok, cast(count(*) AS bigint) AS c
    FROM toks GROUP BY lang, tok
),
uni_tot AS (
    SELECT lang, cast(sum(c) AS bigint) AS n_tokens,
           cast(count(*) AS bigint) AS vocab
    FROM uni GROUP BY lang
),
h1 AS (
    SELECT u.lang,
           cast(sum(cast(floor(1000000.0 * (u.c / cast(t.n_tokens AS double))
                     * ln(cast(t.n_tokens AS double) / u.c)) AS bigint))
                AS bigint) AS h1_micro
    FROM uni u JOIN uni_tot t ON u.lang = t.lang
    GROUP BY u.lang
),
big AS (
    SELECT lang, bg, cast(count(*) AS bigint) AS c
    FROM bigrams GROUP BY lang, bg
),
big_tot AS (
    SELECT lang, cast(sum(c) AS bigint) AS n_bigrams,
           cast(count(*) AS bigint) AS bigram_types
    FROM big GROUP BY lang
),
h2 AS (
    SELECT b.lang,
           cast(sum(cast(floor(1000000.0 * (b.c / cast(t.n_bigrams AS double))
                     * ln(cast(t.n_bigrams AS double) / b.c)) AS bigint))
                AS bigint) AS h12_micro
    FROM big b JOIN big_tot t ON b.lang = t.lang
    GROUP BY b.lang
)
SELECT ut.lang, ut.n_tokens, ut.vocab, bt.bigram_types,
       h1.h1_micro, h2.h12_micro,
       h2.h12_micro - h1.h1_micro AS cond_micro,
       cast(floor(1000000.0 * ln(cast(ut.vocab AS double))) AS bigint)
           AS uniform_ceiling_micro
FROM uni_tot ut
JOIN big_tot bt ON ut.lang = bt.lang
JOIN h1 ON ut.lang = h1.lang
JOIN h2 ON ut.lang = h2.lang
ORDER BY ut.lang
"""


@register("ngram_entropy_rate", oracle=_entropy_rate_sql("duckdb"))
def ngram_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus entropy profile: unigram entropy H(W), bigram
    entropy H(W₁W₂), and the conditional entropy rate H(W₂|W₁) =
    H(W₁W₂) − H(W), with the uniform ceiling ln(V) for scale. Degenerate
    shards announce themselves here: boilerplate repetition collapses
    the conditional rate toward 0 while noise pushes it toward the
    ceiling. Each p·ln(1/p) term is floor-quantized to micro-nats per
    n-gram type before the per-language sum (exact-bigint, order-proof);
    the two grouped passes combine map-side and the final join runs over
    |langs| rows. Companions: zipf_fit (rank-frequency shape),
    kneser_ney_bigram (per-doc LM scoring), vocab_growth_curve (Heaps
    law), gopher_quality_signals (per-doc repetition)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_entropy_rate_sql("spark"))
