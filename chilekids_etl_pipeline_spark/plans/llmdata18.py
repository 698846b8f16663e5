"""Training-data pipeline operators, batch 18 (round 7): degenerate-loop
detection and int8 quantization retrieval-recall probe.

Public recipes as declarative Spark plans:

- Repetition-loop detection: the classic degenerate-generation /
  low-quality-text signature (Holtzman et al. 2019's neural text
  degeneration; Gopher's repetition filters measure duplicate MASS,
  this measures the longest PERIODIC RUN): for periods p ∈ {1,2,3},
  the longest run of positions where word[i] == word[i−p] — "the cat
  the cat the cat" lights up p=2 with a run proportional to the loop.
- Quantization recall probe (standard vector-index evaluation, e.g.
  Faiss practice): top-5 neighbor overlap between full-precision and
  int8-dequantized embeddings for a hash-sampled probe set — the
  measured answer to "does 4× compression change retrieval?", pairing
  embedding_quantize_int8 (storage/error) with its retrieval impact.

Dual-dialect SQL for the loop detector; the recall probe runs both
neighbor searches on the shared BLAS matmul kernel and the oracle
re-derives them with exact SQL folds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import words_sql

from ..sources.tables import load_table, maybe_rebalance
from .registry import register


def _idiv(dialect: str) -> str:
    return "DIV" if dialect == "spark" else "//"


# ---------------------------------------------------------------------------
# periodic-repetition loop detector


_LOOP_PERIODS = (1, 2, 3)
_LOOP_TOP = 100


def _loop_sql(dialect: str) -> str:
    w = words_sql(dialect)
    idiv = _idiv(dialect)
    ps = ", ".join(str(p) for p in _LOOP_PERIODS)
    if dialect == "spark":
        toks = """
toks AS (
    SELECT doc_id, pe.i, pe.tok
    FROM words LATERAL VIEW posexplode(w) pe AS i, tok
)"""
    else:
        toks = """
toks AS (
    SELECT doc_id, u.i, w[u.i + 1] AS tok
    FROM words, LATERAL (SELECT unnest(range(0, len(w))) AS i) u
)"""
    if dialect == "spark":
        unpivot = ("LATERAL VIEW explode(array("
                   "named_struct('p', 1, 'm', m1), "
                   "named_struct('p', 2, 'm', m2), "
                   "named_struct('p', 3, 'm', m3))) u AS pm")
        p_col, m_col = "pm.p", "pm.m"
    else:
        unpivot = (", LATERAL (SELECT unnest([struct_pack(p := 1, m := m1), "
                   "struct_pack(p := 2, m := m2), "
                   "struct_pack(p := 3, m := m3)]) AS pm) u")
        p_col, m_col = "(pm).p", "(pm).m"
    return f"""
WITH words AS (SELECT doc_id, {w} AS w FROM documents),
lens AS (SELECT doc_id, cast(size_w AS bigint) AS n_words FROM (
    SELECT doc_id, {"size(w)" if dialect == "spark" else "len(w)"} AS size_w
    FROM words) t WHERE size_w > 0),
{toks.strip()},
-- positions that CONTINUE a period-p loop: word[i] == word[i-p].
-- Three lag() columns in ONE window pass (a single doc_id shuffle),
-- then a 3-way struct unpivot — no self-join
lagged AS (
    SELECT doc_id, i,
           CASE WHEN tok = lag(tok, 1) OVER w THEN 1 ELSE 0 END AS m1,
           CASE WHEN tok = lag(tok, 2) OVER w THEN 1 ELSE 0 END AS m2,
           CASE WHEN tok = lag(tok, 3) OVER w THEN 1 ELSE 0 END AS m3
    FROM toks
    WINDOW w AS (PARTITION BY doc_id ORDER BY i)
),
hits AS (
    SELECT doc_id, {p_col} AS p, i
    FROM lagged {unpivot}
    WHERE {m_col} = 1
),
-- gaps-and-islands: consecutive hit positions share (i - row_number)
islands AS (
    SELECT doc_id, p, i,
           i - row_number() OVER (PARTITION BY doc_id, p ORDER BY i)
               AS isl
    FROM hits
),
runs AS (
    SELECT doc_id, p, cast(count(*) AS bigint) AS run_hits
    FROM islands GROUP BY doc_id, p, isl
),
-- a run of R consecutive period-p matches spans R + p words
best_per_p AS (
    SELECT doc_id, p, max(run_hits) + p AS loop_words
    FROM runs GROUP BY doc_id, p
),
best AS (
    SELECT doc_id, p AS best_p, loop_words,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY loop_words DESC, p) AS rn
    FROM best_per_p
)
SELECT b.doc_id, l.n_words, b.best_p, b.loop_words,
       (b.loop_words * 1000000) {idiv} l.n_words AS loop_score_micro
FROM best b JOIN lens l ON b.doc_id = l.doc_id
WHERE b.rn = 1
ORDER BY loop_score_micro DESC, b.doc_id
LIMIT {_LOOP_TOP}
"""


@register("loop_detect_score", oracle=_loop_sql("duckdb"))
def loop_detect_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-loop screen: for each document, the longest periodic
    run (word[i] == word[i−p], p ∈ {1,2,3}) as a fraction of the
    document — the signature of stuck generation loops and copy-paste
    stutter that duplicate-MASS filters (gopher_quality_signals) dilute
    on long documents. One token explode, then THREE lag() columns in a
    single (doc_id ORDER BY i) window pass — no self-join — unpivoted
    into a (p, match) grid; gaps-and-islands over (doc_id, p) turns
    consecutive matches into runs. Everything downstream partitions by
    doc_id, so the lag window, islands window, and run aggregation ride
    one shuffle; output is the top-100 worst offenders. Companions:
    gopher_quality_signals (duplicate mass), ocr_artifact_score,
    text_quality."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_loop_sql("spark"))


# ---------------------------------------------------------------------------
# int8 quantization recall probe


_QR_EVERY = 41
_QR_K = 5

def _qrecall_oracle() -> str:
    dq = ("list_transform(v, x -> cast(floor(x / sc * 127 + 0.5) AS int)"
          " * sc / 127)")
    dot = ("round(list_reduce(list_transform(list_zip(q.v, c.v), "
           "p -> p[1] * p[2]), (a, b) -> a + b) / (q.nrm * c.nrm), 6)")

    def ranked(src: str, alias: str) -> str:
        return f"""
{alias} AS (
    SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY {dot} DESC, c.vec_id) AS rank
        FROM {src} q JOIN {src} c ON c.vec_id <> q.vec_id
        WHERE q.vec_id % {_QR_EVERY} = 0
    ) WHERE rank <= {_QR_K}
)"""

    return f"""
WITH base AS (
    SELECT vec_id, list_transform(embedding, x -> cast(x AS double)) AS v
    FROM embeddings
),
scaled AS (
    SELECT vec_id, v,
           list_max(list_transform(v, x -> abs(x))) AS sc
    FROM base
),
full_n AS (
    SELECT vec_id, v,
           sqrt(list_reduce(list_transform(v, x -> x * x),
                            (a, b) -> a + b)) AS nrm
    FROM scaled WHERE sc > 0
),
quant_n AS (
    SELECT vec_id, v,
           sqrt(list_reduce(list_transform(v, x -> x * x),
                            (a, b) -> a + b)) AS nrm
    FROM (SELECT vec_id, {dq} AS v FROM scaled WHERE sc > 0) t
),
{ranked("full_n", "full_top").strip()},
{ranked("quant_n", "quant_top").strip()}
SELECT f.query_id,
       cast(count(q.neighbor_id) AS bigint) AS n_common,
       cast(count(q.neighbor_id) AS bigint) * 1000000 // {_QR_K}
           AS overlap_micro
FROM full_top f LEFT JOIN quant_top q
    ON f.query_id = q.query_id AND f.neighbor_id = q.neighbor_id
GROUP BY f.query_id
ORDER BY f.query_id
"""


@register("quantization_recall_probe", oracle=_qrecall_oracle())
def quantization_recall_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval impact of int8 compression: top-5 cosine neighbors
    computed twice — full-precision and int8-dequantized (the
    embedding_quantize_int8 scheme: per-vector max-abs scale,
    floor(x/s·127+0.5)) — for every 41st vector, reporting per-probe
    neighbor overlap. This is the standard index-evaluation loop (recall
    of the compressed index against exact search) run corpus-side.

    Both searches run FUSED on one corpus pass (guide §1.2: the old
    two-call form paid two embeddings scans, two probe collects and two
    racing mapInPandas stages for what is one matmul kernel plus a numpy
    transform): each Arrow batch scores the full matrix AND its
    int8-dequantized twin — `floor(x/s·127+0.5)·s/127` is elementwise
    IEEE double arithmetic, bit-identical whether Catalyst or numpy
    evaluates it — and emits side-tagged per-partition top-k partials;
    one metadata-scale window ranks both sides. The probe set is the
    bounded side (same 100k broadcast refusal as topk_cosine) —
    corpus-scale quantization QA goes through ann_ivf_cosine's cells
    like semantic_dedup. Companions: embedding_quantize_int8
    (storage/error), matryoshka_dim_fidelity (truncation impact),
    knn_topk_cosine (exact baseline)."""
    import numpy as np
    import pandas as pd

    from ..operators.similarity import MAX_BRUTE_FORCE_QUERIES

    # gated widening (2-split embeddings scan starves the vector
    # lambdas + BLAS kernel; sf1 A/B: 3.4 -> 2.0 s)
    emb = maybe_rebalance(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x AS double))").alias("vec"),
        F.expr(
            "array_max(transform(embedding, x -> abs(cast(x AS double))))"
        ).alias("sc"),
    ).filter(F.col("sc") > 0)

    qpd = (
        emb.filter(F.col("vec_id") % _QR_EVERY == 0)
        .limit(MAX_BRUTE_FORCE_QUERIES + 1)
        .toPandas()
    )
    if len(qpd) > MAX_BRUTE_FORCE_QUERIES:
        raise ValueError(
            f"quantization_recall_probe broadcasts its probe matrix and must "
            f"stay <= {MAX_BRUTE_FORCE_QUERIES} probes (got more). Use the "
            f"ann_ivf_cosine cells for corpus-scale quantization QA."
        )
    qid_t = emb.schema["vec_id"].dataType.simpleString()
    if len(qpd) == 0:
        return spark.createDataFrame(
            [],
            schema=f"query_id {qid_t}, n_common bigint, overlap_micro bigint",
        )

    def _dequant(mat: np.ndarray, sc: np.ndarray) -> np.ndarray:
        # same expression (and evaluation order) as the oracle / the
        # embedding_quantize_int8 scheme: floor(x / s * 127 + 0.5) * s / 127
        s = sc[:, None]
        return np.floor(mat / s * 127 + 0.5) * s / 127

    qids = qpd["vec_id"].to_numpy()
    qmat = np.array(qpd["vec"].tolist(), dtype=np.float64)
    qsc = qpd["sc"].to_numpy(dtype=np.float64)
    qqmat = _dequant(qmat, qsc)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qqnorm = np.sqrt((qqmat * qqmat).sum(axis=1))
    bq = spark.sparkContext.broadcast((qids, qmat, qnorm, qqmat, qqnorm))

    def _round6(x):
        # HALF-AWAY-FROM-ZERO, like topk_cosine / F.round / DuckDB
        return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6

    def _score_both(batches):
        b_qids, b_qmat, b_qnorm, b_qqmat, b_qqnorm = bq.value
        nq = len(b_qids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.array(pdf["vec"].tolist(), dtype=np.float64)
            cids = pdf["vec_id"].to_numpy()
            csc = pdf["sc"].to_numpy(dtype=np.float64)
            cqmat = _dequant(cmat, csc)
            cnorm = np.sqrt((cmat * cmat).sum(axis=1))
            cqnorm = np.sqrt((cqmat * cqmat).sum(axis=1))
            out_side, out_q, out_n, out_s = [], [], [], []
            for side, (mat, nrm, qm, qn) in enumerate(
                ((cmat, cnorm, b_qmat, b_qnorm),
                 (cqmat, cqnorm, b_qqmat, b_qqnorm))
            ):
                scores = _round6((mat @ qm.T) / np.outer(nrm, qn))
                for j in range(nq):
                    keep = np.nonzero(cids != b_qids[j])[0]
                    if keep.size == 0:
                        continue
                    order = np.lexsort((cids[keep], -scores[keep, j]))[:_QR_K]
                    sel = keep[order]
                    out_side.append(np.full(sel.size, side, dtype=np.int32))
                    out_q.append(np.full(sel.size, b_qids[j]))
                    out_n.append(cids[sel])
                    out_s.append(scores[sel, j])
            if out_q:
                yield pd.DataFrame(
                    {
                        "side": np.concatenate(out_side),
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_s),
                    }
                )

    partials = emb.mapInPandas(
        _score_both,
        f"side int, query_id {qid_t}, neighbor_id {qid_t}, cosine double",
    )
    from pyspark.sql import Window

    w = Window.partitionBy("side", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    top = (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _QR_K)
    )
    # overlap without a second pass: per (query, neighbor), note which
    # sides ranked it, then count full-side neighbors the quant side
    # also kept — exactly the old left-join count
    pairs = top.groupBy("query_id", "neighbor_id").agg(
        F.max(F.when(F.col("side") == 0, 1).otherwise(0)).alias("in_full"),
        F.max(F.when(F.col("side") == 1, 1).otherwise(0)).alias("in_quant"),
    )
    return (
        pairs.filter(F.col("in_full") == 1)
        .groupBy("query_id")
        .agg(F.sum("in_quant").cast("bigint").alias("n_common"))
        .select(
            "query_id",
            "n_common",
            (F.col("n_common") * 1000000 / F.lit(_QR_K))
            .cast("bigint")
            .alias("overlap_micro"),
        )
        .orderBy("query_id")
    )
