"""Training-data pipeline operators, batch 13 (round 7): group-relative
advantage computation (the GRPO post-training shape), exact weighted
sampling without replacement (Efraimidis–Spirakis A-Res), and a
DoReMi-style domain-reweighting step.

Reference scope note: these extend the engine beyond the reference's ETL
surface, following public recipes — GRPO's group-baseline advantage
(Shao et al. 2024, DeepSeekMath), weighted reservoir sampling via
exponential keys (Efraimidis & Spirakis 2006), and DoReMi's
excess-loss multiplicative-weights update (Xie et al. 2023) —
re-expressed as declarative Spark plans.

Dual-dialect SQL templates, no Python UDFs; every comparison-relevant
quantity is exact integer arithmetic (micros, counts) or a
floor-quantized double whose operand expression is textually identical
in both engines, so the engines hash identically.
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
    """First 8 md5 hex digits of ``expr`` as a non-negative bigint —
    the deterministic 'random' both engines agree on."""
    if dialect == "spark":
        return f"cast(conv(substr(md5({expr}), 1, 8), 16, 10) AS bigint)"
    return f"cast(('0x' || substr(md5({expr}), 1, 8)) AS bigint)"


# ---------------------------------------------------------------------------
# group-relative advantage (GRPO)


_GRPO_GROUP = 8  # samples per prompt group
_GRPO_CLIP_MICRO = 2_000_000  # |advantage| > 2 sigma → clipped


def _grpo_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    return f"""
WITH samples AS (
    -- n completions per prompt: consecutive docs form a group; the
    -- per-sample reward is the doc's length signal standing in for the
    -- judge/verifier score a production run joins in
    SELECT doc_id, doc_id {idiv} {_GRPO_GROUP} AS prompt_id,
           cast(n_chars AS bigint) AS reward
    FROM documents
),
grp AS (
    SELECT prompt_id, cast(count(*) AS bigint) AS n,
           cast(sum(reward) AS bigint) AS s,
           cast(sum(reward * reward) AS bigint) AS q
    FROM samples GROUP BY prompt_id
)
SELECT sm.prompt_id, sm.doc_id, sm.reward, g.n AS group_n,
       -- (r - mean)/std in one exact-integer-fed expression:
       -- (n*r - S) / sqrt(n*Q - S^2); numerator and radicand are exact
       -- bigints, so the double division is bit-identical cross-engine
       CASE WHEN g.n * g.q - g.s * g.s = 0 THEN 0
            ELSE cast(floor(1000000.0 * cast(g.n * sm.reward - g.s AS double)
                            / sqrt(cast(g.n * g.q - g.s * g.s AS double)))
                      AS bigint)
       END AS adv_micro,
       CASE WHEN g.n * g.q - g.s * g.s = 0 THEN false
            ELSE abs(floor(1000000.0 * cast(g.n * sm.reward - g.s AS double)
                           / sqrt(cast(g.n * g.q - g.s * g.s AS double))))
                 > {_GRPO_CLIP_MICRO}
       END AS clipped
FROM samples sm JOIN grp g ON g.prompt_id = sm.prompt_id
"""


@register("grpo_advantage_plan", oracle=_grpo_sql("duckdb"))
def grpo_advantage_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-relative advantage computation — the data side of GRPO
    post-training: n sampled completions per prompt, each sample's
    advantage is its reward standardized against the GROUP's mean/std
    (no learned value baseline), plus the ±2σ clip flag the trainer
    consumes. The group moments reduce to (n, Σr, Σr²) — mergeable
    partial aggregates — and the advantage is (n·r − S)/√(nQ − S²),
    fed exclusively by exact bigints so the distributed agg order can't
    shift the result. One shuffle on prompt_id shared by the agg and the
    sample↔group join (co-partitioned); zero-variance groups emit 0, a
    probe pins both that and that each group's advantages sum to ~0."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_grpo_sql("spark"))


# ---------------------------------------------------------------------------
# weighted sampling without replacement (Efraimidis–Spirakis A-Res)


_WS_K = 100


def _wsample_sql(dialect: str) -> str:
    s = _s(dialect)
    h = _h32(dialect, f"concat(cast(doc_id AS {s}), ':u')")
    return f"""
WITH keyed AS (
    -- u ~ Uniform(0,1) as deterministic hash micros (never 0), weight =
    -- doc length; the E-S exponential race key is -ln(u)/w, smallest k
    -- win — selection probability proportional to weight, without
    -- replacement
    SELECT doc_id, cast(n_chars AS bigint) AS w,
           1 + ({h} % 999999) AS u_micro
    FROM documents
),
scored AS (
    SELECT doc_id, w, u_micro,
           cast(floor(1000000.0
                      * (-ln(cast(u_micro AS double) / 1000000.0))
                      / cast(w AS double)) AS bigint) AS key_micro
    FROM keyed
)
SELECT doc_id, w, u_micro, key_micro,
       row_number() OVER (ORDER BY key_micro, doc_id) AS sample_rank
FROM (
    SELECT doc_id, w, u_micro, key_micro
    FROM scored ORDER BY key_micro, doc_id LIMIT {_WS_K}
) top
"""


@register("weighted_sample_topk", oracle=_wsample_sql("duckdb"))
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted sampling WITHOUT replacement at corpus scale —
    the Efraimidis–Spirakis A-Res scheme: give row i the key
    -ln(u_i)/w_i (u_i a deterministic hash uniform) and keep the k
    smallest keys; the winners are distributed exactly as sequential
    weighted draws without replacement. The length-weighted pick here is
    the standard "sample tokens, not documents" curation draw. The whole
    operator is ONE top-k: Spark plans the inner ORDER BY+LIMIT as
    TakeOrderedAndProject (per-partition heaps merged on one reducer —
    no global sort, no full shuffle), and the rank window runs on the
    k surviving rows only. Keys are floor-quantized micros with doc_id
    tie-break, so both engines pick the identical sample."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_wsample_sql("spark"))


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting step


def _doremi_sql(dialect: str) -> str:
    s = _s(dialect)
    w = words_sql(dialect)
    nw = f"size({w})" if dialect == "spark" else f"len({w})"
    h = _h32(dialect, f"concat(source, ':loss')")
    return f"""
WITH dom AS (
    SELECT source, cast(count(*) AS bigint) AS n_docs,
           cast(sum({nw}) AS bigint) AS tokens
    FROM documents GROUP BY source
),
lossy AS (
    -- per-domain excess loss of the proxy model vs the reference run.
    -- In production this column is measured and joined in; here it is a
    -- deterministic synthetic stand-in (1.0–3.0 nats, hash micros) so
    -- the update arithmetic is externally checkable
    SELECT source, n_docs, tokens,
           1000000 + ({h} % 2000000) AS loss_micro
    FROM dom
),
base AS (
    SELECT source, n_docs, tokens, loss_micro,
           min(loss_micro) OVER () AS floor_micro,
           sum(tokens) OVER () AS tot_tokens
    FROM lossy
),
upd AS (
    SELECT source, n_docs, tokens, loss_micro,
           loss_micro - floor_micro AS excess_micro,
           -- multiplicative-weights factor exp(eta * excess), eta=1,
           -- floor-quantized BEFORE the cross-domain normalization so
           -- the normalizing sum is an exact bigint
           cast(floor(1000000.0 * exp(
                cast(loss_micro - floor_micro AS double) / 1000000.0))
                AS bigint) AS factor_micro,
           cast(floor(1000000.0 * cast(tokens AS double)
                      / cast(tot_tokens AS double)) AS bigint)
               AS weight_before_micro
    FROM base
),
norm AS (
    SELECT source, n_docs, tokens, loss_micro, excess_micro, factor_micro,
           weight_before_micro, tokens * factor_micro AS numer,
           sum(tokens * factor_micro) OVER () AS denom
    FROM upd
)
SELECT source, n_docs, tokens, loss_micro, excess_micro, factor_micro,
       weight_before_micro,
       cast(floor(1000000.0 * cast(numer AS double)
                  / cast(denom AS double)) AS bigint)
           AS weight_after_micro
FROM norm
"""


@register("doremi_reweight_step", oracle=_doremi_sql("duckdb"))
def doremi_reweight_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi domain-reweighting step: start from the token-share
    mixture, multiply each domain's weight by exp(η·excess_loss)
    (multiplicative weights on the proxy model's per-domain excess loss
    over the floor), renormalize — the optimization-step companion to
    mixture_temperature_plan's static heuristic. The corpus scan reduces
    to per-source token sums (mergeable partials); the update itself is
    5 rows of window arithmetic, with the exp factor floor-quantized to
    micro bigints BEFORE the normalizing sum so cross-engine double
    accumulation order never enters. Iterating re-runs the same plan
    with refreshed losses; at 100 TB the scan is the cost and it is one
    pass. The loss column is a documented synthetic stand-in (production
    joins the measured proxy/reference losses)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_doremi_sql("spark"))
