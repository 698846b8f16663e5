"""Training-data pipeline operators, batch 11: CCNet-style per-language
perplexity bucketing, code-vs-prose heuristics, best-of-n rejection
sampling, SFT loss-mask planning, and CER pair evaluation.

Reference scope note: these extend the engine beyond the reference's
ETL surface (riliasov/chilekids-etl-pipeline has no LLM-data layer);
they follow the public recipes — CCNet (Wenzek et al. 2020) head/
middle/tail split, rejection sampling / best-of-n (Bai et al. 2022),
and span-style SFT masking — re-expressed as declarative Spark plans.

Dual-dialect SQL templates, no Python UDFs; every derived quantity is
integer micros or engine-stable arithmetic so DuckDB and Spark hash
identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import stop_hits_sql, word_len_sum_sql, words_sql
from ..sources.tables import load_table
from .registry import register

_W_SPARK = words_sql("spark")
_W_DUCK = words_sql("duckdb")


def _w(dialect: str) -> str:
    return _W_SPARK if dialect == "spark" else _W_DUCK


def _nw(dialect: str, w: str) -> str:
    return f"size({w})" if dialect == "spark" else f"len({w})"


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


# ---------------------------------------------------------------------------
# CCNet-style perplexity buckets (head / middle / tail per language)


def _ccnet_sql(dialect: str) -> str:
    # oracle composes the bigram-LM score the same way the Spark side
    # reuses bigram_lm_score; resolved lazily so module import order
    # doesn't matter
    from .llmdata import _LM_ORACLE

    idiv = _idiv(dialect)
    scored_src = (
        "lm_scored_for_buckets" if dialect == "spark" else f"({_LM_ORACLE})"
    )
    return f"""
WITH scored AS (
    SELECT s.doc_id,
           cast(round(s.avg_neg_logp * 1000000) AS bigint) AS score_micro,
           d.lang
    FROM {scored_src} s JOIN documents d ON d.doc_id = s.doc_id
),
dist AS (
    SELECT lang, score_micro, cast(count(*) AS bigint) AS cnt
    FROM scored GROUP BY lang, score_micro
),
ranked AS (
    SELECT lang, score_micro, cnt,
           coalesce(sum(cnt) OVER (PARTITION BY lang ORDER BY score_micro
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING), 0) AS cum_before,
           sum(cnt) OVER (PARTITION BY lang) AS n_lang
    FROM dist
),
bucketed AS (
    SELECT lang, score_micro, cnt,
           cast((cum_before * 3) {idiv} n_lang AS bigint) AS bucket
    FROM ranked
)
SELECT lang, bucket,
       cast(sum(cnt) AS bigint) AS n_docs,
       min(score_micro) AS score_lo_micro,
       max(score_micro) AS score_hi_micro
FROM bucketed GROUP BY lang, bucket
"""


@register("ccnet_perplexity_buckets", oracle=lambda: _ccnet_sql("duckdb"))
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail corpus split: score every doc with
    the corpus-trained bigram LM (reusing bigram_lm_score's plan), then
    bucket per language by cumulative rank — head = best (lowest
    avg -ln P) third. The rank is computed over the per-(lang, score)
    COUNT table, not the corpus: a groupBy shrinks the data to distinct
    score values first, so the window sort touches vocabulary-sized
    state and the per-doc bucket assignment would be a broadcast join
    back — the two-phase rank that replaces a full per-language corpus
    sort at 100 TB. Ties share a bucket deterministically. Scores are
    integer micros derived from the already-rounded LM output, so both
    engines bucket identically."""
    from .llmdata import bigram_lm_score

    bigram_lm_score(spark, sf_dir).createOrReplaceTempView(
        "lm_scored_for_buckets"
    )
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_ccnet_sql("spark"))


# ---------------------------------------------------------------------------
# code-vs-prose heuristic classification

_CODE_KEYWORDS = [
    "select", "join", "filter", "merge", "sort", "group", "table",
    "index", "scan", "query",
]
_KW_DENSITY_CODE_MICRO = 300000  # ≥30% keyword tokens → code-like


def _code_sql(dialect: str) -> str:
    w = _w(dialect)
    nw = _nw(dialect, "w")
    idiv = _idiv(dialect)
    kw = stop_hits_sql(dialect, "w", _CODE_KEYWORDS)
    wlen = word_len_sum_sql(dialect, "w")
    return f"""
WITH toks AS (
    SELECT doc_id, w, cast({nw} AS bigint) AS n_words
    FROM (SELECT doc_id, {w} AS w FROM documents)
),
sig AS (
    SELECT doc_id, n_words,
           cast({kw} AS bigint) AS kw_hits,
           cast({wlen} AS bigint) AS char_sum
    FROM toks WHERE n_words > 0
)
SELECT doc_id, n_words, kw_hits,
       (kw_hits * 1000000) {idiv} n_words AS kw_density_micro,
       (char_sum * 1000000) {idiv} n_words AS avg_wlen_micro,
       CASE WHEN (kw_hits * 1000000) {idiv} n_words
                 >= {_KW_DENSITY_CODE_MICRO}
            THEN 1 ELSE 0 END AS is_code
FROM sig
"""


@register("code_prose_classify", oracle=_code_sql("duckdb"))
def code_prose_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing signals per document: reserved-token
    density, mean token length, and a thresholded is_code flag — the
    cheap first-pass router that decides which quality pipeline (code
    linting vs prose filtering) a crawl document enters. Pure per-row
    array expressions inside whole-stage codegen; zero shuffle, scan-
    bound at any corpus size."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_code_sql("spark"))


# ---------------------------------------------------------------------------
# best-of-n rejection sampling

_GROUP_N = 8
_REWARD_STOPS = ["the", "a", "of", "and", "is", "to", "in"]


def _bestofn_sql(dialect: str) -> str:
    w = _w(dialect)
    nw = _nw(dialect, "w")
    idiv = _idiv(dialect)
    reward = stop_hits_sql(dialect, "w", _REWARD_STOPS)
    return f"""
WITH cand AS (
    SELECT doc_id, doc_id {idiv} {_GROUP_N} AS group_id,
           (cast({reward} AS bigint) * 1000000) {idiv} {nw} AS reward_micro
    FROM (SELECT doc_id, {w} AS w FROM documents)
    WHERE {nw} > 0
),
ranked AS (
    SELECT group_id, doc_id, reward_micro,
           row_number() OVER (PARTITION BY group_id
                              ORDER BY reward_micro DESC, doc_id) AS rk,
           cast(count(*) OVER (PARTITION BY group_id) AS bigint)
               AS n_candidates
    FROM cand
)
SELECT group_id,
       max(CASE WHEN rk = 1 THEN doc_id END) AS best_doc_id,
       max(CASE WHEN rk = 1 THEN reward_micro END) AS best_reward_micro,
       cast(coalesce(max(CASE WHEN rk = 1 THEN reward_micro END)
                     - max(CASE WHEN rk = 2 THEN reward_micro END), 0)
            AS bigint) AS margin_micro,
       max(n_candidates) AS n_candidates
FROM ranked WHERE rk <= 2
GROUP BY group_id
"""


@register("best_of_n_select", oracle=_bestofn_sql("duckdb"))
def best_of_n_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-n rejection sampling: candidates grouped by prompt
    (doc_id DIV n as the stand-in prompt key), a deterministic reward
    per candidate (integer-micro fluency proxy), keep the argmax with
    doc_id tie-break, and report the winner's margin over the runner-up
    — the margin is the signal RLHF data curation uses to drop
    ambiguous groups. One window over the group key (high cardinality,
    n-bounded groups → perfectly parallel); no joins, no collect."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_bestofn_sql("spark"))


# ---------------------------------------------------------------------------
# SFT loss-mask plan

_PACK_LEN = 512


def _sft_mask_sql(dialect: str) -> str:
    w = _w(dialect)
    nw = _nw(dialect, "w")
    idiv = _idiv(dialect)
    return f"""
WITH sized AS (
    SELECT doc_id, cast({nw} AS bigint) AS n_tokens
    FROM (SELECT doc_id, {w} AS w FROM documents)
    WHERE {nw} > 0
),
split AS (
    SELECT doc_id, n_tokens,
           least(greatest(n_tokens {idiv} 5, 5), n_tokens) AS prompt_tokens
    FROM sized
)
SELECT doc_id, n_tokens, prompt_tokens,
       n_tokens - prompt_tokens AS response_tokens,
       (prompt_tokens * 1000000) {idiv} n_tokens AS mask_frac_micro,
       (n_tokens + {_PACK_LEN} - 1) {idiv} {_PACK_LEN} AS n_pack_seqs
FROM split
"""


@register("sft_mask_plan", oracle=_sft_mask_sql("duckdb"))
def sft_mask_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SFT loss-mask plan: split each document into a prompt span
    (masked from the loss — 20% of tokens, floor 5) and a response span
    (trained on), and size the packed-sequence layout at 512 tokens —
    the per-example metadata an instruction-tuning dataloader consumes
    (the SFT twin of span_corruption_plan). All integer arithmetic,
    row-local, zero shuffle."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_sft_mask_sql("spark"))


# ---------------------------------------------------------------------------
# CER pair evaluation (hypothesis vs reference transcript)

_CER_TAIL = 120  # compare the last N chars — where the divergence lives


def _cer_sql(dialect: str) -> str:
    from .llmdata import _DOCS_AUG_DUCK, PLANT_SENTINEL

    idiv = _idiv(dialect)
    if dialect == "spark":
        pairs_src = "cer_pairs_src"
    else:
        pairs_src = f"""(
    WITH {_DOCS_AUG_DUCK.strip()}
    SELECT r.doc_id, r.text AS ref_text, h.text AS hyp_text
    FROM docs r JOIN docs h ON h.doc_id = r.doc_id + {PLANT_SENTINEL}
    WHERE r.doc_id < {PLANT_SENTINEL})"""
    tail = (
        f"substr({{c}}, greatest(length({{c}}) - {_CER_TAIL - 1}, 1))"
    )
    ref_t = tail.format(c="ref_text")
    hyp_t = tail.format(c="hyp_text")
    return f"""
WITH tails AS (
    SELECT doc_id, {ref_t} AS ref_tail, {hyp_t} AS hyp_tail
    FROM {pairs_src}
)
SELECT doc_id,
       cast(length(ref_tail) AS bigint) AS ref_len,
       cast(length(hyp_tail) AS bigint) AS hyp_len,
       cast(levenshtein(ref_tail, hyp_tail) AS bigint) AS edit_dist,
       (cast(levenshtein(ref_tail, hyp_tail) AS bigint) * 1000000)
           {idiv} length(ref_tail) AS cer_micro
FROM tails
"""


@register("cer_pair_eval", oracle=lambda: _cer_sql("duckdb"))
def cer_pair_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-error-rate evaluation of hypothesis transcripts against
    references (the ASR/OCR eval join): pair every reference doc with
    its derived hypothesis twin (the planted near-copy corpus) on the
    doc key, then Levenshtein over an aligned 120-char tail window.
    The window bound is what makes this scale: edit distance is
    O(n·m), so CER systems align first and score bounded segments —
    full-transcript DP at 100 TB is a non-starter, 120×120 cells per
    pair is free. The pairing itself is a plain equi-join on the doc
    key (shuffle-partitioned, broadcastable when one side is an eval
    slice)."""
    from .llmdata import _docs_aug_spark, PLANT_SENTINEL

    docs = _docs_aug_spark(spark, sf_dir)
    docs.createOrReplaceTempView("cer_docs_aug")
    spark.sql(
        f"""
        SELECT r.doc_id, r.text AS ref_text, h.text AS hyp_text
        FROM cer_docs_aug r JOIN cer_docs_aug h
          ON h.doc_id = r.doc_id + {PLANT_SENTINEL}
        WHERE r.doc_id < {PLANT_SENTINEL}
        """
    ).createOrReplaceTempView("cer_pairs_src")
    return spark.sql(_cer_sql("spark"))
