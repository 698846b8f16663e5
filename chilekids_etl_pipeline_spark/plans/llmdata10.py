"""LLM-data operators, batch 10 (round 5): evaluation and curation
primitives — the unbiased pass@k estimator over attempt logs, a
blocklist keyword screen with per-source rates, an event-lateness
profile for choosing streaming watermarks, and Matryoshka embedding
truncation fidelity (top-1 agreement of prefix-dim search vs full-dim).

Dual-dialect templates; probability-like outputs are exact integer
ppm (floored rational arithmetic) or sequential-fold doubles (the
zip/reduce dot-product order is fixed and identical in both engines),
never order-dependent double sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, maybe_rebalance
from .registry import register

# ---------------------------------------------------------------------------
# pass@k evaluation

_PASS_ATTEMPTS_PER_PROBLEM = 20
_PASS_KS = (1, 5, 10)


def _pass_at_k_sql(dialect: str) -> str:
    s = "string" if dialect == "spark" else "varchar"
    idiv = "DIV" if dialect == "spark" else "//"
    ks_vals = ", ".join(str(k) for k in _PASS_KS)
    ks_expl = (
        f"explode(array({ks_vals}))" if dialect == "spark"
        else f"unnest([{ks_vals}])"
    )
    if dialect == "spark":
        # falling-factorial products C(n-c,k)/C(n,k) as exact bigints
        num = ("aggregate(sequence(0, k - 1), cast(1 AS bigint), "
               "(acc, j) -> acc * (n_fail - j))")
        den = ("aggregate(sequence(0, k - 1), cast(1 AS bigint), "
               "(acc, j) -> acc * (n - j))")
    else:
        num = ("list_reduce(list_transform(range(0, k), "
               "j -> cast(n_fail - j AS bigint)), (a, b) -> a * b)")
        den = ("list_reduce(list_transform(range(0, k), "
               "j -> cast(n - j AS bigint)), (a, b) -> a * b)")
    return f"""
WITH attempts AS (
    -- attempt log: problem id + deterministic per-attempt pass flag
    -- (~25% solve rate keyed on the doc hash)
    SELECT doc_id {idiv} {_PASS_ATTEMPTS_PER_PROBLEM} AS problem,
           CASE WHEN substr(md5(cast(doc_id AS {s})), 1, 1)
                     IN ('0', '1', '2', '3') THEN 1 ELSE 0 END AS passed
    FROM documents
),
per_problem AS (
    SELECT problem,
           cast(count(*) AS bigint) AS n,
           cast(sum(passed) AS bigint) AS n_pass,
           cast(count(*) - sum(passed) AS bigint) AS n_fail
    FROM attempts GROUP BY problem
),
per_k AS (
    SELECT p.*, k FROM per_problem p
    CROSS JOIN (SELECT {ks_expl} AS k
                FROM (SELECT 1 AS one) t) ks
    WHERE n >= k
),
-- unbiased estimator: pass@k = 1 - C(n-c, k)/C(n, k). The ratio is an
-- exact rational; it lands as FLOORED integer ppm so the cross-problem
-- mean is a sum of exact integers (an order-dependent double sum of
-- per-problem estimates would not be engine-portable).
scored AS (
    SELECT k, problem, n, n_pass,
           CASE WHEN n_fail < k THEN cast(1000000 AS bigint)
                ELSE 1000000 - (({num}) * 1000000) {idiv} ({den})
           END AS pass_ppm
    FROM per_k
)
SELECT k,
       cast(count(*) AS bigint) AS n_problems,
       cast(sum(CASE WHEN pass_ppm = 1000000 THEN 1 ELSE 0 END) AS bigint)
           AS n_certain,
       cast(sum(pass_ppm) AS bigint) AS sum_pass_ppm,
       sum(pass_ppm) / (cast(count(*) AS double) * 1000000)
           AS mean_pass_at_k
FROM scored GROUP BY k
"""


@register("pass_at_k_eval", oracle=_pass_at_k_sql("duckdb"))
def pass_at_k_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k over an attempt log — the coding/math-eval metric, with
    the unbiased estimator 1 - C(n-c,k)/C(n,k) (naive empirical pass@k
    from k-subsampling is biased). The binomial ratio is computed as
    exact falling-factorial bigint products (n=20, k≤10 keeps the
    numerator ×1e6 under 2^63), floored to integer ppm per problem so
    the cross-problem aggregate is integer-exact and engine-portable.
    One groupBy over the attempt log, a 3-row k-explode over the tiny
    per-problem table, and a final metadata-scale aggregate — the same
    plan shape at a billion attempts."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_pass_at_k_sql("spark"))


# ---------------------------------------------------------------------------
# blocklist keyword screen

_BLOCK_TERMS = ("slow", "crash", "leak")  # stand-in blocklist


def _keyword_screen_sql(dialect: str) -> str:
    if dialect == "spark":
        def hits(term: str) -> str:
            return (f"cast(size(filter(split(lower(text), ' '), "
                    f"w -> w = '{term}')) AS bigint)")
    else:
        def hits(term: str) -> str:
            return (f"cast(len(list_filter(string_split(lower(text), ' '), "
                    f"w -> w = '{term}')) AS bigint)")

    hit_cols = ",\n           ".join(
        f"{hits(t)} AS hits_{t}" for t in _BLOCK_TERMS
    )
    total = " + ".join(f"hits_{t}" for t in _BLOCK_TERMS)
    hit_list = ", ".join(f"hits_{t}" for t in _BLOCK_TERMS)
    sums = ",\n       ".join(
        f"cast(sum(hits_{t}) AS bigint) AS total_{t}" for t in _BLOCK_TERMS
    )
    return f"""
WITH scanned AS (
    SELECT source, doc_id,
           {hit_cols}
    FROM documents
),
flagged AS (
    SELECT source, {hit_list}, {total} AS n_hits,
           CASE WHEN {total} > 0 THEN 1 ELSE 0 END AS is_flagged
    FROM scanned
)
SELECT source,
       cast(count(*) AS bigint) AS n_docs,
       cast(sum(is_flagged) AS bigint) AS n_flagged,
       sum(is_flagged) / cast(count(*) AS double) AS flag_rate,
       cast(sum(n_hits) AS bigint) AS total_hits,
       {sums}
FROM flagged
GROUP BY source
"""


@register("safety_keyword_screen", oracle=_keyword_screen_sql("duckdb"))
def safety_keyword_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocklist keyword screening — the first, cheapest curation gate
    every web-scale corpus runs before any model-based filter: exact
    whole-word matches against a term list (word-split equality, not
    substring, so 'class' never matches 'ass'-style terms), per-source
    flag rates and per-term totals for the datasheet. Pure column
    expressions over one scan; the term list is a compile-time literal
    here and a broadcast table in production. Counts are exact
    integers; the only division is the per-source rate."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_keyword_screen_sql("spark"))


# ---------------------------------------------------------------------------
# event-lateness profile (watermark sizing)

_WATERMARKS_MIN = (5, 15, 30, 60)


def _lateness_sql(dialect: str) -> str:
    if dialect == "spark":
        delay = ("cast(conv(substr(md5(cast(event_id AS string)), 1, 4), "
                 "16, 10) AS bigint) % 120")
        q = ("percentile(delay_min, array(cast(0.5 AS double), "
             "cast(0.95 AS double), cast(0.99 AS double)))")

        def at(i: int) -> str:  # 1-based element accessor
            return f"element_at(p.qs, {i})"
    else:
        delay = ("cast(('0x' || substr(md5(cast(event_id AS varchar)), 1, 4)) "
                 "AS bigint) % 120")
        q = ("quantile_cont(delay_min, [cast(0.5 AS double), "
             "cast(0.95 AS double), cast(0.99 AS double)])")

        def at(i: int) -> str:
            return f"p.qs[{i}]"

    wm_vals = ", ".join(str(w) for w in _WATERMARKS_MIN)
    wm_expl = (
        f"explode(array({wm_vals}))" if dialect == "spark"
        else f"unnest([{wm_vals}])"
    )
    return f"""
WITH delays AS (
    -- deterministic synthetic arrival delay (minutes): the network /
    -- device-offline lag between event time and ingest time. In
    -- production this column is (ingest_ts - event_ts).
    SELECT event_id, {delay} AS delay_min FROM events
),
profile AS (
    SELECT cast(count(*) AS bigint) AS n_events, {q} AS qs FROM delays
),
per_wm AS (
    SELECT wm, cast(count(*) AS bigint) AS n_events,
           cast(sum(CASE WHEN delay_min > wm THEN 1 ELSE 0 END) AS bigint)
               AS n_dropped
    FROM delays
    CROSS JOIN (SELECT {wm_expl} AS wm
                FROM (SELECT 1 AS one) t) wms
    GROUP BY wm
)
SELECT w.wm AS watermark_min, w.n_events, w.n_dropped,
       w.n_dropped / cast(w.n_events AS double) AS drop_rate,
       round({at(1)}, 4) AS p50_delay_min,
       round({at(2)}, 4) AS p95_delay_min,
       round({at(3)}, 4) AS p99_delay_min
FROM per_wm w CROSS JOIN profile p
"""


@register("lateness_watermark_profile", oracle=_lateness_sql("duckdb"))
def lateness_watermark_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-lateness distribution vs candidate watermarks — the
    analysis that SIZES a streaming watermark before you deploy it:
    for each candidate lateness bound, the fraction of events the
    streaming job would drop (arrive later than the bound), beside the
    delay percentiles that justify the choice. The streaming twin
    (streaming/incremental.py) consumes the chosen bound; this batch
    profile is how it gets chosen from history. One scan, a 4-row
    explode over the aggregate, exact integer drop counts."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_lateness_sql("spark"))


# ---------------------------------------------------------------------------
# Matryoshka truncation fidelity

_MATRYOSHKA_DIMS = (8, 16, 32, 64)


def _matryoshka_sql(dialect: str) -> str:
    s = "string" if dialect == "spark" else "varchar"
    if dialect == "spark":
        to_d = "transform(embedding, x -> cast(x AS double))"
        prefix = "slice(v, 1, d)"

        def dot(a: str, b: str) -> str:
            return (f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
                    f"cast(0 AS double), (acc, x) -> acc + x)")
    else:
        to_d = "list_transform(embedding, x -> cast(x AS double))"
        prefix = "v[1:d]"

        def dot(a: str, b: str) -> str:
            return (f"list_reduce(list_transform(list_zip({a}, {b}), "
                    f"p -> p[1] * p[2]), (a, b) -> a + b)")

    dims_vals = ", ".join(str(d) for d in _MATRYOSHKA_DIMS)
    dims_expl = (
        f"explode(array({dims_vals}))" if dialect == "spark"
        else f"unnest([{dims_vals}])"
    )
    return f"""
WITH vecs AS (
    SELECT vec_id, {to_d} AS v FROM embeddings
),
-- fixed deterministic probe set (~1/256 of vectors): small enough that
-- probes x corpus stays bounded at any sf; the corpus side scans once
probes AS (
    SELECT vec_id AS probe_id, v AS pv FROM vecs
    WHERE substr(md5(cast(vec_id AS {s})), 1, 2) = '00'
),
dimmed AS (
    SELECT probe_id, pv, d,
           {prefix.replace('v', 'pv')} AS pv_d
    FROM probes
    CROSS JOIN (SELECT {dims_expl} AS d
                FROM (SELECT 1 AS one) t) ds
),
-- per (probe, dim): cosines against every corpus vector. The zip/
-- reduce fold is sequential and identically ordered in both engines,
-- so the rounded doubles hash-match.
pairs AS (
    SELECT dm.probe_id, dm.d, c.vec_id AS cand_id,
           round({dot('dm.pv', 'c.v')}
                 / (sqrt({dot('dm.pv', 'dm.pv')})
                    * sqrt({dot('c.v', 'c.v')})), 6) AS cos_full,
           round({dot('dm.pv_d', prefix.replace('v', 'c.v'))}
                 / (sqrt({dot('dm.pv_d', 'dm.pv_d')})
                    * sqrt({dot(prefix.replace('v', 'c.v'),
                                prefix.replace('v', 'c.v'))})), 6)
               AS cos_prefix
    FROM dimmed dm CROSS JOIN vecs c
    WHERE c.vec_id <> dm.probe_id
),
ranked AS (
    SELECT probe_id, d, cand_id, cos_full, cos_prefix,
           row_number() OVER (PARTITION BY probe_id, d
                              ORDER BY cos_full DESC, cand_id) AS r_full,
           row_number() OVER (PARTITION BY probe_id, d
                              ORDER BY cos_prefix DESC, cand_id) AS r_pref
    FROM pairs
),
top_full AS (
    SELECT probe_id, d, cand_id AS full_top1, cos_full AS full_top1_cos
    FROM ranked WHERE r_full = 1
),
top_pref AS (
    SELECT probe_id, d, cand_id AS pref_top1,
           cos_full AS pref_top1_full_cos
    FROM ranked WHERE r_pref = 1
)
SELECT f.d AS dim,
       cast(count(*) AS bigint) AS n_probes,
       cast(sum(CASE WHEN f.full_top1 = p.pref_top1
                     THEN 1 ELSE 0 END) AS bigint) AS top1_agree,
       sum(CASE WHEN f.full_top1 = p.pref_top1 THEN 1 ELSE 0 END)
           / cast(count(*) AS double) AS top1_agreement_rate,
       cast(sum(cast(floor((f.full_top1_cos - p.pref_top1_full_cos)
                           * 1000000) AS bigint)) AS bigint)
           AS regret_sum_micro
FROM top_full f
JOIN top_pref p ON p.probe_id = f.probe_id AND p.d = f.d
GROUP BY f.d
"""


@register("matryoshka_dim_fidelity", oracle=_matryoshka_sql("duckdb"))
def matryoshka_dim_fidelity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation fidelity: for each prefix dimension
    (8/16/32/64 of 64), how often nearest-neighbor search on the
    truncated vectors returns the SAME top-1 as full-dimension search,
    plus the total cosine regret (full-cosine gap between the true
    top-1 and the truncated search's pick, in exact floored
    micro-units). This is the measurement behind shipping short
    embeddings for the ANN stage and re-ranking with full vectors —
    the standard two-stage retrieval cost cut. The probe set is a
    deterministic ~1/256 hash sample so probe x corpus work stays
    bounded at any scale; at 100 TB the corpus side would be the ANN
    index (ann_ivf_cosine), not a scan.

    The probe x corpus scoring runs on the shared mapInPandas BLAS
    kernel (operators/similarity.py:prefix_top1 — one matmul per
    prefix dim per Arrow batch, per-partition top-1 partials merged by
    a metadata-scale window), not per-pair SQL aggregate folds: the
    fold form allocates an array per scored pair and measured ~4x
    slower than the oracle at sf0.1; only the tiny per-(probe,dim)
    agreement/regret arithmetic stays in Catalyst."""
    from ..operators.similarity import prefix_top1

    # gated widening (2-split embeddings scan; sf1 A/B: 1.5 -> 0.8 s)
    emb = maybe_rebalance(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> cast(x AS double))"
        ).alias("vec"),
    )
    probes = emb.filter(
        F.expr("substr(md5(cast(vec_id AS string)), 1, 2) = '00'")
    )
    top1 = prefix_top1(probes, emb, _MATRYOSHKA_DIMS)
    return (
        top1.groupBy(F.col("d").alias("dim"))
        .agg(
            F.count("*").cast("long").alias("n_probes"),
            F.sum(
                F.when(F.col("full_top1") == F.col("pref_top1"), 1)
                .otherwise(0)
            ).cast("long").alias("top1_agree"),
            (
                F.sum(
                    F.when(F.col("full_top1") == F.col("pref_top1"), 1)
                    .otherwise(0)
                ) / F.count("*").cast("double")
            ).alias("top1_agreement_rate"),
            F.sum(
                F.floor(
                    (F.col("full_top1_cos") - F.col("pref_top1_full_cos"))
                    * 1000000
                )
            ).cast("long").alias("regret_sum_micro"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge learning

_BPE_ROUNDS = 6


def _bpe_sql(dialect: str) -> str:
    if dialect == "spark":
        chars = "trim(regexp_replace(concat(w, '_'), '(.)', '$1 '))"
        pairs_expl = (
            "explode(transform(sequence(1, size(ts) - 1), "
            "i -> named_struct('p1', element_at(ts, i), "
            "'p2', element_at(ts, i + 1)))) AS pr"
        )
        ntok = "size(split(tok, ' '))"
        tok_expl = "explode(split(tok, ' ')) AS t"
    else:
        chars = "trim(regexp_replace(concat(w, '_'), '(.)', '\\1 ', 'g'))"
        pairs_expl = (
            "unnest(list_transform(range(1, len(ts)), "
            "i -> {'p1': ts[i], 'p2': ts[i + 1]})) AS pr"
        )
        ntok = "len(string_split(tok, ' '))"
        tok_expl = "unnest(string_split(tok, ' ')) AS t"
    split_fn = "split" if dialect == "spark" else "string_split"

    rounds = []
    prev = "tok0"
    for r in range(1, _BPE_ROUNDS + 1):
        rounds.append(f"""pairs{r} AS (
    -- single-token words have no adjacent pairs; the guard also keeps
    -- Spark's sequence(1, 0) (which is DESCENDING, not empty) out of
    -- the pair transform
    SELECT pr.p1 AS p1, pr.p2 AS p2, cast(sum(cnt) AS bigint) AS pc
    FROM (SELECT cnt, {split_fn}(tok, ' ') AS ts FROM {prev}
          WHERE {ntok} >= 2) t,
         LATERAL (SELECT {pairs_expl}) e
    GROUP BY pr.p1, pr.p2
),
merge{r} AS (
    SELECT p1, p2, pc,
           concat(' ', p1, ' ', p2, ' ') AS pat,
           concat(' ', p1, p2, ' ') AS rep
    FROM pairs{r} ORDER BY pc DESC, p1, p2 LIMIT 1
),
tok{r} AS (
    -- three boundary-guarded replace passes: one pass cannot re-match
    -- across a consumed shared space (runs of the same token), three
    -- cover runs up to length 8 — beyond any word in a real vocab
    SELECT w, cnt,
           trim(replace(replace(replace(concat(' ', tok, ' '),
                m.pat, m.rep), m.pat, m.rep), m.pat, m.rep)) AS tok
    FROM {prev} CROSS JOIN merge{r} m
),
stats{r} AS (
    SELECT {r} AS round,
           (SELECT p1 FROM merge{r}) AS left_tok,
           (SELECT p2 FROM merge{r}) AS right_tok,
           (SELECT pc FROM merge{r}) AS pair_count,
           cast(sum(cnt * {ntok}) AS bigint) AS corpus_tokens_after,
           (SELECT cast(count(DISTINCT t) AS bigint)
            FROM (SELECT {tok_expl} FROM tok{r}) u) AS token_types_after
    FROM tok{r}
)""")
        prev = f"tok{r}"
    chain = ",\n".join(rounds)
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM stats{r}" for r in range(1, _BPE_ROUNDS + 1)
    )
    return f"""
WITH vocab AS (
    SELECT w, cast(count(*) AS bigint) AS cnt
    FROM (SELECT {tok_expl.replace('tok', 'lower(text)')} FROM documents) u,
         LATERAL (SELECT t AS w) v
    WHERE t <> ''
    GROUP BY w
),
tok0 AS (SELECT w, cnt, {chars} AS tok FROM vocab),
{chain}
{union}
"""


@register("bpe_merge_learn", oracle=_bpe_sql("duckdb"))
def bpe_merge_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge learning, six rounds unrolled: the
    corpus reduces ONCE to a (word, count) vocabulary (the only
    fact-scale aggregation — identical at 100 TB), then each round
    counts weighted adjacent-token pairs over that metadata-scale
    table, picks the top pair (count desc, pair asc tie-break) and
    applies the merge via boundary-guarded string replacement. Output
    per round: the learned merge rule, its support, and the corpus
    token count + token-type count after applying it — the vocab-size/
    compression trajectory a tokenizer team actually reads. This is
    the training half of the tokenizer family (fertility and coverage
    entries measure the inference half).

    Structure: exactly what the scale story demands — the corpus reduces
    ONCE to a persisted (word, count, tok) vocabulary, then a driver-side
    loop issues two tiny jobs per round over that metadata-scale table
    (top-pair pick via TakeOrdered, post-merge stats via one exploded
    aggregate); the merge rule is applied with literal search/replace
    columns, no re-derivation of earlier rounds. The six result rows are
    assembled driver-side, so every intermediate cache is released before
    returning. (The previous single-SQL unrolled chain re-expanded the
    whole lineage per round reference: 8.9 s at sf0.1 vs ~2 s for this
    loop — and at 100 TB the unrolled form would re-reduce the corpus
    per round, while this one touches the corpus exactly once.)"""
    docs = maybe_rebalance(load_table(spark, sf_dir, "documents"))
    vocab = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tok = vocab.withColumn(
        "tok",
        F.expr(
            "trim(regexp_replace(concat(w, '_'), '(.)', '$1 '))"
        ),
    ).persist()
    cached = [tok]
    rows = []
    try:
        for r in range(1, _BPE_ROUNDS + 1):
            ts = F.split(F.col("tok"), " ")
            pairs = (
                tok.filter(F.size(ts) >= 2)
                .select(
                    "cnt",
                    F.explode(
                        F.expr(
                            "transform(sequence(1, size(split(tok, ' ')) - 1), "
                            "i -> named_struct("
                            "'p1', element_at(split(tok, ' '), i), "
                            "'p2', element_at(split(tok, ' '), i + 1)))"
                        )
                    ).alias("pr"),
                )
                .groupBy(F.col("pr.p1").alias("p1"), F.col("pr.p2").alias("p2"))
                .agg(F.sum("cnt").cast("long").alias("pc"))
            )
            top = pairs.orderBy(F.desc("pc"), "p1", "p2").limit(1).collect()
            if not top:
                break
            p1, p2, pc = top[0].p1, top[0].p2, top[0].pc
            pat, rep = f" {p1} {p2} ", f" {p1}{p2} "
            # three boundary-guarded replace passes (runs of the same
            # token can't re-match across a consumed shared space; three
            # passes cover runs up to 8 — beyond any real word), same as
            # the oracle's replace chain
            merged = F.concat(F.lit(" "), F.col("tok"), F.lit(" "))
            for _ in range(3):
                merged = F.replace(merged, F.lit(pat), F.lit(rep))
            tok = tok.withColumn("tok", F.trim(merged)).persist()
            cached.append(tok)
            rows.append((r, p1, p2, int(pc)))
        # Post-merge stats for ALL rounds in ONE job (r12): the loop's
        # per-round blocking stats collect added a full job round-trip
        # per round on top of the unavoidable top-pair pick; every
        # tok_r is persisted (materialized by round r+1's pair scan
        # or here), so a single union-of-aggregates reads cached blocks.
        if rows:
            stats_df = None
            for r, _p1, _p2, _pc in rows:
                s = (
                    cached[r]
                    .select(
                        "cnt",
                        F.explode(F.split(F.col("tok"), " ")).alias("t"),
                    )
                    .agg(
                        F.sum("cnt").cast("long").alias("corpus_tokens_after"),
                        F.count_distinct("t").cast("long").alias(
                            "token_types_after"
                        ),
                    )
                    .select(F.lit(r).alias("round"), "*")
                )
                stats_df = s if stats_df is None else stats_df.unionByName(s)
            stats = {
                row["round"]: row for row in stats_df.collect()
            }
            rows = [
                (
                    r,
                    p1,
                    p2,
                    pc,
                    int(stats[r].corpus_tokens_after),
                    int(stats[r].token_types_after),
                )
                for r, p1, p2, pc in rows
            ]
    finally:
        for df in cached:
            df.unpersist()
    return spark.createDataFrame(
        rows,
        "round int, left_tok string, right_tok string, pair_count bigint, "
        "corpus_tokens_after bigint, token_types_after bigint",
    )
