"""Training-data pipeline operators, batch 16 (round 7): corpus n-gram
inventory, negative-sampling distribution, and semi-hard negative mining.

Public recipes re-expressed as declarative Spark plans:

- WIMBD-style corpus n-gram inventory (Elazar et al. 2024 "What's In My
  Big Data?"): the most frequent word n-grams with their document
  frequency — the first diagnostic run on any new pretraining corpus.
- word2vec negative-sampling distribution (Mikolov et al. 2013): the
  unigram^0.75 table with cumulative ranges, the structure a sampler
  binary-searches at training time.
- Semi-hard negative mining (FaceNet, Schroff et al. 2015; standard
  contrastive-training practice): per anchor, the most similar items
  inside a cosine band — below the near-duplicate zone, above the
  uninformative easy-negative zone — excluding same-label positives.

Dual-dialect SQL templates; cross-row float sums are floor-quantized to
integer micros first, so distributed aggregation order cannot move a bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import words_sql
from ..operators.similarity import VEC_AS_DOUBLE, band_topk_cosine
from ..sources.tables import load_table, maybe_rebalance
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


# ---------------------------------------------------------------------------
# corpus trigram inventory (WIMBD-style)


def _ngram_topk_sql(dialect: str) -> str:
    w = words_sql(dialect)
    idiv = _idiv(dialect)
    if dialect == "spark":
        grams = f"""
grams AS (
    SELECT doc_id, concat_ws(' ', element_at(w, i + 1),
                             element_at(w, i + 2),
                             element_at(w, i + 3)) AS gram
    FROM words LATERAL VIEW explode(sequence(0, size(w) - 3)) t AS i
    WHERE size(w) >= 3
)"""
    else:
        grams = f"""
grams AS (
    SELECT doc_id, w[u.i + 1] || ' ' || w[u.i + 2] || ' ' || w[u.i + 3]
               AS gram
    FROM words, LATERAL (SELECT unnest(range(0, len(w) - 2)) AS i) u
    WHERE len(w) >= 3
)"""
    if dialect == "spark":
        counts_cte = """per_doc AS (
    -- stage 1: (gram, doc) occurrence counts — map-side combinable,
    -- removing the count(DISTINCT) expand (which doubled the shuffled
    -- rows); the oracle keeps the independent single-pass DISTINCT
    -- form, so the two engines cross-check different plans
    SELECT gram, doc_id, cast(count(*) AS bigint) AS c
    FROM grams GROUP BY gram, doc_id
),
counts AS (
    SELECT gram, cast(sum(c) AS bigint) AS n_occ,
           cast(count(*) AS bigint) AS n_docs
    FROM per_doc GROUP BY gram
)"""
    else:
        counts_cte = """counts AS (
    SELECT gram, cast(count(*) AS bigint) AS n_occ,
           cast(count(DISTINCT doc_id) AS bigint) AS n_docs
    FROM grams GROUP BY gram
)"""
    return f"""
WITH words AS (SELECT doc_id, {w} AS w FROM documents),
{grams.strip()},
{counts_cte},
tot AS (SELECT cast(sum(n_occ) AS bigint) AS total FROM counts)
SELECT gram, n_occ, n_docs,
       (n_occ * 1000000) {idiv} t.total AS occ_share_micro
FROM counts CROSS JOIN tot t
ORDER BY n_occ DESC, gram
LIMIT 20
"""


@register("ngram_topk_df", oracle=_ngram_topk_sql("duckdb"))
def ngram_topk_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WIMBD-style corpus trigram inventory: the 20 most frequent word
    trigrams with occurrence count, document frequency, and corpus
    share. One explode → one grouped aggregation → a 20-row limit; the
    group-by combines map-side, so the shuffle carries one row per
    distinct trigram per partition, not one per occurrence. Companion
    diagnostics: vocab_top_terms (unigrams), cooccurrence_pmi (skip-gram
    associations), ngram_novelty (cross-corpus overlap)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_ngram_topk_sql("spark"))


# ---------------------------------------------------------------------------
# word2vec negative-sampling distribution


def _negsample_sql(dialect: str) -> str:
    w = words_sql(dialect)
    idiv = _idiv(dialect)
    if dialect == "spark":
        tok = ("SELECT tok FROM words "
               "LATERAL VIEW explode(w) t AS tok")
    else:
        tok = "SELECT unnest(w) AS tok FROM words"
    return f"""
WITH words AS (SELECT {w} AS w FROM documents),
toks AS ({tok}),
counts AS (
    SELECT tok, cast(count(*) AS bigint) AS n
    FROM toks GROUP BY tok
),
weighted AS (
    -- unigram^0.75, floor-quantized to micros per word BEFORE the
    -- normalizing sum: the distribution table is exact-bigint
    SELECT tok, n, cast(floor(1000000.0 * pow(n, 0.75)) AS bigint) AS w_micro
    FROM counts
),
tot AS (SELECT cast(sum(w_micro) AS bigint) AS total_w FROM weighted)
SELECT tok, n, w_micro,
       (w_micro * 1000000) {idiv} t.total_w AS p_micro,
       cast(sum(w_micro) OVER (ORDER BY n DESC, tok
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS bigint) AS cum_lo,
       cast(sum(w_micro) OVER (ORDER BY n DESC, tok
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS bigint) AS cum_hi
FROM weighted CROSS JOIN tot t
ORDER BY n DESC, tok
"""


@register("negative_sampling_freq", oracle=_negsample_sql("duckdb"))
def negative_sampling_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec negative-sampling table: unigram counts raised to 0.75,
    normalized to exact micro-probabilities, with half-open cumulative
    ranges [cum_lo, cum_hi) a sampler binary-searches with a uniform
    draw. The token count aggregates map-side; the cumulative window
    runs over the VOCABULARY (thousands of rows), not the corpus, so the
    single-partition window is metadata-scale — the same shape as any
    final ranking. cum_lo of the first row is NULL (empty frame) by
    construction, pinning the half-open convention."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_negsample_sql("spark"))


# ---------------------------------------------------------------------------
# semi-hard negative mining


_HARD_NEG_LO = 0.10
_HARD_NEG_HI = 0.45
_HARD_NEG_N = 5
_HARD_NEG_EVERY = 17

_HARD_NEG_ORACLE = f"""
WITH base AS (
    SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v,
           label
    FROM embeddings
),
norms AS (
    SELECT vec_id, v, label,
           sqrt(list_reduce(list_transform(v, x -> x * x),
                            (a, b) -> a + b)) AS nrm
    FROM base
),
q AS (SELECT * FROM norms WHERE vec_id % {_HARD_NEG_EVERY} = 0),
pairs AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           round(list_reduce(list_transform(list_zip(q.v, c.v),
                                            p -> p[1] * p[2]),
                             (a, b) -> a + b) / (q.nrm * c.nrm), 6) AS cosine
    FROM q CROSS JOIN norms c
    WHERE c.vec_id <> q.vec_id AND c.label <> q.label
)
SELECT query_id, neighbor_id, rank, cosine
FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY cosine DESC, neighbor_id) AS rank
    FROM pairs
    WHERE cosine >= {_HARD_NEG_LO} AND cosine < {_HARD_NEG_HI}
) WHERE rank <= {_HARD_NEG_N}
"""


@register("hard_negative_mining", oracle=_HARD_NEG_ORACLE)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-hard negatives for contrastive training: for each anchor
    (every 17th vector), the top-5 most similar DIFFERENT-label items
    with cosine in [0.10, 0.45) — above the easy-negative noise floor,
    below the likely-duplicate zone (FaceNet's semi-hard rule, applied
    corpus-side as a mining batch job).

    Executes on the shared BLAS kernel (operators/similarity.py
    band_topk_cosine): the bounded anchor matrix broadcasts, each corpus
    partition scores all anchors in one matmul and emits only its
    per-anchor top-5 inside the band, and a metadata-scale window merges
    partials — |anchors| x |corpus| work distributed over the corpus
    scan, never an all-pairs shuffle. The band test uses the rounded
    cosine, so boundary candidates land exactly where the oracle's do.
    At 100 TB the anchor set is the bounded side (it refuses > 100k
    anchors); corpus-vs-corpus mining goes through the ANN cell paths
    like semantic_dedup."""
    # gated widening (2-split embeddings scan starves the BLAS kernel;
    # sf1 A/B: 3.5 -> 0.9 s)
    emb = maybe_rebalance(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", F.expr(VEC_AS_DOUBLE).alias("vec"), "label"
    )
    anchors = emb.filter(F.col("vec_id") % _HARD_NEG_EVERY == 0)
    return band_topk_cosine(
        anchors,
        emb,
        n=_HARD_NEG_N,
        lo=_HARD_NEG_LO,
        hi=_HARD_NEG_HI,
        exclude_col="label",
    )
