"""Training-data pipeline operators, batch 9: denoising-objective span
planning (T5-style corruption), summary-overlap evaluation (ROUGE-N
recall), preference-pair construction (the DPO/RLHF data-prep step),
and tokenizer vocabulary coverage curves.

Dual-dialect SQL templates, no Python UDFs, deterministic hash-derived
positions so reruns and engines agree. Registered after the external
gate window; rotates next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import stop_hits_sql, words_sql
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# span-corruption plan (T5-style denoising)

_CORRUPT_RATE_PCT = 15  # percent of tokens masked
_SPAN_LEN = 3


def _span_plan_sql(dialect: str) -> str:
    w = words_sql(dialect)
    nw = f"size({w})" if dialect == "spark" else f"len({w})"
    ex = "explode" if dialect == "spark" else "unnest"
    idiv = "DIV" if dialect == "spark" else "//"
    spans = (
        f"{ex}(sequence(0, n_spans - 1))"
        if dialect == "spark"
        else f"{ex}(range(0, n_spans))"
    )
    return f"""
WITH sized AS (
    SELECT doc_id, cast({nw} AS bigint) AS n_words
    FROM documents WHERE {nw} >= 20
),
planned AS (
    SELECT doc_id, n_words,
           (n_words * {_CORRUPT_RATE_PCT}) {idiv} (100 * {_SPAN_LEN})
               AS n_spans
    FROM sized
),
spans AS (
    SELECT doc_id, n_words, n_spans, {spans} AS span_idx
    FROM planned WHERE n_spans > 0
)
SELECT doc_id, span_idx,
       cast((span_idx * n_words) {idiv} n_spans AS bigint) AS start_pos,
       cast(least((span_idx * n_words) {idiv} n_spans + {_SPAN_LEN},
                  n_words) AS bigint) AS end_pos,
       cast(least((span_idx * n_words) {idiv} n_spans + {_SPAN_LEN},
                  n_words)
            - (span_idx * n_words) {idiv} n_spans AS bigint) AS n_masked
FROM spans
"""


@register("span_corruption_plan", oracle=_span_plan_sql("duckdb"))
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span-corruption plan: ~15% of each document's tokens
    masked in length-3 spans, span starts spread evenly by integer
    arithmetic (i·n/n_spans) so the plan is deterministic across
    reruns, engines, and partitionings — the metadata a denoising
    dataloader consumes (the text twin of vit_patch_plan /
    audio_chunk_plan: plan in the engine, byte-work in the loader).
    One row-local explode, no shuffle at all; every position is
    integer division."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_span_plan_sql("spark"))


# ---------------------------------------------------------------------------
# ROUGE-N recall of planted summaries

_ROUGE_EVERY = 10


def _rouge_sql(dialect: str) -> str:
    w = words_sql(dialect)
    ex = "explode" if dialect == "spark" else "unnest"
    if dialect == "spark":
        summary = f"concat_ws(' ', slice({w}, 5, 20))"
        bigrams = (
            f"CASE WHEN size({w}) >= 2 THEN "
            f"transform(sequence(1, size({w}) - 1), "
            f"i -> concat(element_at({w}, i), ' ', element_at({w}, i + 1))) "
            f"ELSE array() END"
        )
    else:
        summary = f"array_to_string(list_slice({w}, 5, 24), ' ')"
        bigrams = (
            f"list_transform(range(1, greatest(len({w}), 1)), "
            f"i -> concat(({w})[i], ' ', ({w})[i + 1]))"
        )
    return f"""
WITH refs AS (
    SELECT doc_id AS ref_id, text FROM documents
    WHERE doc_id % {_ROUGE_EVERY} = 0
),
cands AS (
    SELECT doc_id AS ref_id, {summary} AS text FROM documents
    WHERE doc_id % {_ROUGE_EVERY} = 0
),
ref1 AS (
    SELECT ref_id, g, cast(count(*) AS bigint) AS c FROM (
        SELECT ref_id, {ex}({w}) AS g FROM refs
    ) x GROUP BY ref_id, g
),
cand1 AS (
    SELECT ref_id, g, cast(count(*) AS bigint) AS c FROM (
        SELECT ref_id, {ex}({w}) AS g FROM cands
    ) x GROUP BY ref_id, g
),
ref2 AS (
    SELECT ref_id, g, cast(count(*) AS bigint) AS c FROM (
        SELECT ref_id, {ex}({bigrams}) AS g FROM refs
    ) x GROUP BY ref_id, g
),
cand2 AS (
    SELECT ref_id, g, cast(count(*) AS bigint) AS c FROM (
        SELECT ref_id, {ex}({bigrams}) AS g FROM cands
    ) x GROUP BY ref_id, g
),
m1 AS (
    SELECT r.ref_id,
           cast(sum(least(r.c, coalesce(c.c, 0))) AS bigint) AS matched,
           cast(sum(r.c) AS bigint) AS ref_total
    FROM ref1 r LEFT JOIN cand1 c ON c.ref_id = r.ref_id AND c.g = r.g
    GROUP BY r.ref_id
),
m2 AS (
    SELECT r.ref_id,
           cast(sum(least(r.c, coalesce(c.c, 0))) AS bigint) AS matched,
           cast(sum(r.c) AS bigint) AS ref_total
    FROM ref2 r LEFT JOIN cand2 c ON c.ref_id = r.ref_id AND c.g = r.g
    GROUP BY r.ref_id
)
SELECT m1.ref_id,
       m1.matched AS rouge1_matched, m1.ref_total AS ref_unigrams,
       round(m1.matched / cast(m1.ref_total AS double), 6) AS rouge1_recall,
       m2.matched AS rouge2_matched, m2.ref_total AS ref_bigrams,
       round(m2.matched / cast(m2.ref_total AS double), 6) AS rouge2_recall
FROM m1 JOIN m2 ON m2.ref_id = m1.ref_id
"""


@register("rouge_overlap_eval", oracle=_rouge_sql("duckdb"))
def rouge_overlap_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUGE-1/ROUGE-2 recall of candidate summaries against their
    reference documents (planted candidates: a 20-word slice of every
    10th doc, so recall is provably positive and bounded) — the
    n-gram-overlap eval every summarization/data-distillation loop
    scores with. Clipped-count matching (min of candidate/reference
    multiplicities) via a grouped LEFT JOIN per n-gram — all
    equi-joins on (ref_id, gram); work is linear in candidate+reference
    tokens, and at eval scale the reference side is the small one."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_rouge_sql("spark"))


# ---------------------------------------------------------------------------
# preference-pair construction (DPO data prep)

def _dpo_sql(dialect: str) -> str:
    w = words_sql(dialect)
    nw = f"size({w})" if dialect == "spark" else f"len({w})"
    stops = stop_hits_sql(
        dialect, w, ["the", "a", "of", "and", "is", "to", "in"]
    )
    return f"""
WITH scored AS (
    SELECT doc_id, source, lang,
           round({stops} / cast(greatest({nw}, 1) AS double)
                 + least({nw}, 200) / cast(400 AS double), 6) AS score
    FROM documents
),
ranked AS (
    SELECT doc_id, source, score,
           row_number() OVER (PARTITION BY source
                              ORDER BY score DESC, doc_id) AS rk_best,
           row_number() OVER (PARTITION BY source
                              ORDER BY score ASC, doc_id) AS rk_worst
    FROM scored
)
SELECT b.source,
       b.doc_id AS chosen_doc, b.score AS chosen_score,
       x.doc_id AS rejected_doc, x.score AS rejected_score,
       round(b.score - x.score, 6) AS margin
FROM (SELECT * FROM ranked WHERE rk_best = 1) b
JOIN (SELECT * FROM ranked WHERE rk_worst = 1) x
  ON x.source = b.source
WHERE b.doc_id <> x.doc_id
"""


@register("dpo_pair_construction", oracle=_dpo_sql("duckdb"))
def dpo_pair_construction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair construction for DPO/RLHF-style tuning: within
    each prompt group (source stands in for the prompt), the
    highest-scoring document becomes `chosen` and the lowest `rejected`,
    with the score margin carried for margin-weighted losses. Two rank
    windows over the same partition (one shuffle on source) and a
    self-join of the two rank-1 slices — per-group output is exactly
    one pair regardless of group size, and deterministic tie-breaks
    make the pair stable across engines. In production the score is a
    reward model; here it is the expression-only quality score so the
    oracle can verify the selection logic exactly."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_dpo_sql("spark"))


# ---------------------------------------------------------------------------
# tokenizer vocabulary coverage

def _vocab_cov_sql(dialect: str) -> str:
    w = words_sql(dialect)
    ex = "explode" if dialect == "spark" else "unnest"
    return f"""
WITH counts AS (
    SELECT word, cast(count(*) AS bigint) AS c FROM (
        SELECT {ex}({w}) AS word FROM documents
    ) u GROUP BY word
),
ranked AS (
    SELECT c, row_number() OVER (ORDER BY c DESC, word) AS rk FROM counts
)
SELECT cast(count(*) AS bigint) AS vocab_size,
       cast(sum(c) AS bigint) AS total_tokens,
       round(sum(CASE WHEN rk <= 10 THEN c ELSE 0 END)
             / cast(sum(c) AS double), 6) AS coverage_top10,
       round(sum(CASE WHEN rk <= 100 THEN c ELSE 0 END)
             / cast(sum(c) AS double), 6) AS coverage_top100,
       round(sum(CASE WHEN rk <= 1000 THEN c ELSE 0 END)
             / cast(sum(c) AS double), 6) AS coverage_top1000,
       round(sum(CASE WHEN rk <= 5000 THEN c ELSE 0 END)
             / cast(sum(c) AS double), 6) AS coverage_top5000
FROM ranked
"""


@register("tokenizer_vocab_coverage", oracle=_vocab_cov_sql("duckdb"))
def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all corpus tokens the
    top-10/100/1000/5000 most frequent words cover — the sizing input
    for a tokenizer vocabulary (where the curve flattens is where
    subword splitting takes over) and a quick OOV-rate estimate for a
    fixed vocab. One explode+count and one conditional reduction; the
    rank window runs over the VOCAB table, not the corpus (at
    web scale, cap the window input with a HAVING count floor — tail
    words by definition cannot affect the reported coverages' leading
    digits)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_vocab_cov_sql("spark"))
