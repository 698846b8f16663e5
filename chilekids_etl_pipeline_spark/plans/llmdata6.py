"""Training-data pipeline operators, batch 6: a portable Count-Min
heavy-hitters sketch (the frequency twin of the HLL entry), the
cross-source duplication matrix (which ingest sources copy each other),
unrolled Lloyd k-means over the embedding column (topic clustering for
mixture curation), and an OCR-artifact scorer (the scan-noise filter a
digitized-books source needs).

Same discipline as plans/llmdata.py..llmdata5.py: dual-dialect SQL
templates (Spark = JVM whole-stage codegen, DuckDB = the oracle), no
Python UDFs anywhere, and every computation is explode →
hash-partitioned aggregation, a bounded window, or per-row arithmetic.

This module must register AFTER the currently-unverified window
(tests/test_registry_order.py): it is imported LAST in plans.load_all()
and rotates into the external gate's first-50 window next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.sketch import CMS_D as _CMS_D
from ..functions.sketch import cms_bucket_sql as _cms_bucket_sql
from ..functions.text import words_sql
from ..sources.tables import load_table, maybe_rebalance
from .registry import register

# ---------------------------------------------------------------------------
# Count-Min heavy hitters (portable, integer-exact; bucket expression
# shared with the streaming twin via functions/sketch.py)

_CMS_TOP = 20  # report the true top-N terms


def _cms_sql(dialect: str) -> str:
    w = words_sql(dialect)
    ex = "explode" if dialect == "spark" else "unnest"
    rows = (
        f"{ex}(sequence(0, {_CMS_D - 1}))"
        if dialect == "spark"
        else f"{ex}(range(0, {_CMS_D}))"
    )
    bucket = _cms_bucket_sql(dialect, "i", "term")
    return f"""
WITH hits AS (
    SELECT {ex}({w}) AS term FROM documents
),
counts AS (
    SELECT term, cast(count(*) AS bigint) AS c FROM hits GROUP BY term
),
salted AS (
    SELECT term, c, {rows} AS i FROM counts
),
sketch AS (
    SELECT i, {bucket} AS b, cast(sum(c) AS bigint) AS cell
    FROM salted GROUP BY i, {bucket}
),
top AS (
    SELECT term, c FROM (
        SELECT term, c,
               row_number() OVER (ORDER BY c DESC, term) AS rn
        FROM counts
    ) ranked WHERE rn <= {_CMS_TOP}
),
probes AS (
    SELECT t.term, t.c, s.i, s.cell
    FROM (SELECT term, c, {rows} AS i FROM top) t
    JOIN sketch s ON s.i = t.i AND s.b = {_cms_bucket_sql(dialect, "t.i", "t.term")}
)
SELECT term,
       cast(min(c) AS bigint) AS true_count,
       cast(min(cell) AS bigint) AS cms_estimate,
       cast(min(cell) - min(c) AS bigint) AS overcount
FROM probes GROUP BY term
"""


@register("heavy_hitters_cms", oracle=_cms_sql("duckdb"))
def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters, engine-portable: d=4 salted-md5
    hash rows × w=512 buckets, built as one token explode + one (i,
    bucket) aggregation — the sketch is d·w rows no matter the corpus
    size, which is the whole point at 100 TB (the frequency analog of
    hll_distinct_portable). The true top-20 terms are then probed
    against the sketch, so the output carries both the exact count and
    the CMS estimate with its guaranteed-nonnegative overcount.
    Everything is integer arithmetic on md5 nibbles — bit-identical
    across engines. At production scale the exact `counts` CTE is the
    expensive path and the sketch replaces it; here both are kept so
    the estimate error is part of the checked output."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_cms_sql("spark"))


# ---------------------------------------------------------------------------
# cross-source duplication matrix

def _dup_matrix_sql(dialect: str) -> str:
    s = "string" if dialect == "spark" else "varchar"
    # planted copies: every 20th doc re-ingested under the next source id
    # (cross-source pair), every 30th duplicated inside its own source.
    return f"""
WITH docs AS (
    SELECT doc_id, text, source FROM documents
    UNION ALL
    SELECT doc_id + 400000,
           text,
           concat('src', cast((cast(substr(source, 4) AS int) + 1) % 20
                              AS {s}))
    FROM documents WHERE doc_id % 20 = 0
    UNION ALL
    SELECT doc_id + 800000, text, source
    FROM documents WHERE doc_id % 30 = 0
),
hs AS (
    SELECT md5(text) AS h, source, cast(count(*) AS bigint) AS n
    FROM docs GROUP BY md5(text), source
),
cross_pairs AS (
    SELECT a.source AS source_a, b.source AS source_b,
           cast(count(*) AS bigint) AS n_dup_groups,
           cast(sum(a.n + b.n) AS bigint) AS n_docs
    FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
    GROUP BY a.source, b.source
),
self_pairs AS (
    SELECT source AS source_a, source AS source_b,
           cast(count(*) AS bigint) AS n_dup_groups,
           cast(sum(n) AS bigint) AS n_docs
    FROM hs WHERE n >= 2 GROUP BY source
)
SELECT * FROM cross_pairs
UNION ALL
SELECT * FROM self_pairs
"""


@register("cross_source_dup_matrix", oracle=_dup_matrix_sql("duckdb"))
def cross_source_dup_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which sources duplicate each other: for every source pair, the
    number of exact-duplicate text groups shared between them (plus the
    within-source diagonal). This is the first question asked when a new
    crawl source lands — is it new data or a re-crawl of something
    already ingested — and it drives source-level dedup ordering. The
    per-(hash, source) aggregate is one map-side-combined shuffle; the
    pair join meets only inside a hash bucket, so pair work is bounded
    by per-text source multiplicity (≤ #sources, a constant), never
    corpus size. Planted copies (+400000 next-source, +800000
    same-source) make both matrix kinds non-empty on the synthetic
    corpus."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_dup_matrix_sql("spark"))


# ---------------------------------------------------------------------------
# unrolled Lloyd k-means on the embedding column

_KM_K = 8


def _kmeans_dims(dialect: str) -> str:
    if dialect == "spark":
        return ("SELECT vec_id, pos, v FROM embeddings "
                "LATERAL VIEW posexplode(embedding) t AS pos, v")
    return ("SELECT vec_id, "
            "unnest(range(0, len(embedding))) AS pos, "
            "unnest(embedding) AS v FROM embeddings")


def _kmeans_sql(dialect: str, dims_src: str | None = None) -> str:
    dims = (
        f"SELECT vec_id, pos, v FROM {dims_src}"
        if dims_src
        else _kmeans_dims(dialect)
    )
    return f"""
WITH dims AS ({dims}),
seeds AS (
    SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS cid
    FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT {_KM_K}) s
),
c0 AS (
    SELECT seeds.cid, d.pos, round(d.v, 6) AS c
    FROM seeds JOIN dims d ON d.vec_id = seeds.vec_id
),
dist1 AS (
    SELECT d.vec_id, c.cid,
           round(sum((d.v - c.c) * (d.v - c.c)), 6) AS dist
    FROM dims d JOIN c0 c ON d.pos = c.pos
    GROUP BY d.vec_id, c.cid
),
a1 AS (
    SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM dist1
    ) r WHERE rn = 1
),
c1 AS (
    SELECT a1.cid, d.pos, round(avg(d.v), 6) AS c
    FROM a1 JOIN dims d ON d.vec_id = a1.vec_id
    GROUP BY a1.cid, d.pos
),
dist2 AS (
    SELECT d.vec_id, c.cid,
           round(sum((d.v - c.c) * (d.v - c.c)), 6) AS dist
    FROM dims d JOIN c1 c ON d.pos = c.pos
    GROUP BY d.vec_id, c.cid
),
a2 AS (
    SELECT vec_id, cid, dist FROM (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY dist, cid) AS rn
        FROM dist2
    ) r WHERE rn = 1
)
SELECT cid,
       cast(count(*) AS bigint) AS n_vecs,
       round(sum(dist), 3) AS inertia
FROM a2 GROUP BY cid
"""


@register("kmeans_lloyd", oracle=_kmeans_sql("duckdb"))
def kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two unrolled Lloyd iterations of k-means (k=8) over the embedding
    column — the topic-clustering step of semantic mixture curation
    (cluster → inspect → reweight), and exactly how IVF coarse
    quantizers are trained. Deterministic seeding (the k smallest
    vec_ids) replaces random init so reruns and engines agree; distances
    and centroids are rounded to 6 dp at each step so the argmin is
    stable across double-summation orders, with cid as the tie-break.
    The plan is pure equi-joins: (vec, pos) × (cid, pos) on pos — the
    centroid side is k·d rows, always broadcastable — then a (vec, cid)
    aggregation; per-iteration cost is linear in vectors × dims × k
    with no pairwise vector join anywhere. More iterations = more of
    the same stages; production k-means on Spark iterates this exact
    DAG with the centroid table checkpointed per round.

    Perf: the dims CTE is referenced by the seed join and BOTH
    iterations' distance+update stages — SQL inlining would re-explode
    the vector table four times, so it is materialized once (the same
    CTE-inlining lesson minhash_containment carries), and repartitioned
    because the local parquet is a single row group (1 scan task). At
    real scale file layout provides the splits and the persisted dims
    table is the per-iteration cache every distributed k-means keeps."""
    emb = maybe_rebalance(load_table(spark, sf_dir, "embeddings"))
    emb.createOrReplaceTempView("embeddings")
    dims = spark.sql(_kmeans_dims("spark"))
    dims.persist().createOrReplaceTempView("kmeans_dims_mat")
    return spark.sql(_kmeans_sql("spark", dims_src="kmeans_dims_mat"))


# ---------------------------------------------------------------------------
# OCR-artifact scoring

def _ocr_sql(dialect: str) -> str:
    w = words_sql(dialect)
    if dialect == "spark":
        nw = f"size({w})"
        single = f"size(filter({w}, x -> length(x) = 1))"
        mixed = f"size(filter({w}, x -> x rlike '[a-z].*[0-9]|[0-9].*[a-z]'))"
    else:
        nw = f"len({w})"
        single = f"len(list_filter({w}, x -> length(x) = 1))"
        mixed = (f"len(list_filter({w}, "
                 f"x -> regexp_matches(x, '[a-z].*[0-9]|[0-9].*[a-z]')))")
    # each [a-z][A-Z] match consumes exactly 2 chars; non-overlapping
    # left-to-right scan is identical in both engines. DuckDB's
    # regexp_replace is FIRST-match-only without the 'g' flag (Spark's is
    # always global) — the flag is the dialect split here.
    g = ", 'g'" if dialect == "duckdb" else ""
    caps = (f"(length(text) - length(regexp_replace(text, '[a-z][A-Z]', ''"
            f"{g}))) / 2")
    noise = f"length(regexp_replace(text, '[a-zA-Z0-9 .,]', ''{g}))"
    return f"""
WITH feat AS (
    SELECT doc_id,
           cast({nw} AS bigint) AS n_words,
           cast({single} AS bigint) AS n_single,
           cast({mixed} AS bigint) AS n_mixed,
           cast({caps} AS bigint) AS n_midcaps,
           cast({noise} AS bigint) AS n_noise,
           cast(length(text) AS bigint) AS n_chars
    FROM documents WHERE length(text) > 0
)
SELECT doc_id, n_words, n_single, n_mixed, n_midcaps, n_noise,
       round(cast(2 * n_single + 3 * n_mixed + 4 * n_midcaps + n_noise
                  AS double)
             / greatest(n_words, 1), 6) AS ocr_score,
       cast(2 * n_single + 3 * n_mixed + 4 * n_midcaps + n_noise AS double)
           / greatest(n_words, 1) > cast(1 AS double) AS suspect
FROM feat
"""


@register("ocr_artifact_score", oracle=_ocr_sql("duckdb"))
def ocr_artifact_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OCR-noise scoring: single-character word rate, digit-letter mixed
    tokens, mid-word case flips (the 'rn'→'m'-class scan artifacts),
    and non-alphanumeric noise density — the standard heuristics for
    filtering digitized-book/PDF-extraction sources before they pollute
    a training mix (complements gopher_quality_signals, which measures
    repetition rather than character-level corruption). Pure per-row
    expressions over one scan: no shuffle at all, embarrassingly
    parallel at any scale. The mid-caps counter uses the
    length-difference trick (each non-overlapping match consumes
    exactly 2 chars) so no regexp_count dialect split is needed."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_ocr_sql("spark"))
