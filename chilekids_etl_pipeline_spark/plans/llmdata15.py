"""Training-data pipeline operators, batch 15 (round 7): embedding-space
isotropy QC and stratified k-fold assignment.

Public recipes — anisotropy measurement for embedding spaces
(Ethayarajh 2019 "How contextual are contextualized representations";
Mu & Viswanath 2018 all-but-the-top) and stratified k-fold
cross-validation assignment (standard ML practice, deterministic
hash-ranked round-robin) — as declarative Spark plans.

Dual-dialect SQL templates; per-row contributions are floor-quantized
to integer micros before any cross-row sum (the PCA-step pattern), so
distributed aggregation order cannot move a bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
# embedding isotropy / anisotropy QC


def _isotropy_sql(dialect: str) -> str:
    idiv = _idiv(dialect)
    if dialect == "spark":
        to_d = "transform(embedding, x -> cast(x AS double))"
        comps = """
comps AS (
    SELECT vec_id, pe.j,
           cast(floor(1000000.0 * pe.xj) AS bigint) AS x_micro,
           cast(floor(1000000.0 * pe.xj * pe.xj) AS bigint) AS x2_micro
    FROM rows_d LATERAL VIEW posexplode(v) pe AS j, xj
)"""
        nrm2 = ("aggregate(transform(v, x -> x * x), cast(0 AS double), "
                "(a, x) -> a + x)")
    else:
        to_d = "list_transform(embedding, x -> cast(x AS double))"
        comps = """
comps AS (
    SELECT vec_id, u.j,
           cast(floor(1000000.0 * v[u.j + 1]) AS bigint) AS x_micro,
           cast(floor(1000000.0 * v[u.j + 1] * v[u.j + 1]) AS bigint)
               AS x2_micro
    FROM rows_d, LATERAL (SELECT unnest(range(0, len(v))) AS j) u
)"""
        nrm2 = ("list_reduce(list_transform(v, x -> x * x), "
                "(a, b) -> a + b)")
    return f"""
WITH rows_d AS (SELECT vec_id, {to_d} AS v FROM embeddings),
{comps.strip()},
norms AS (
    SELECT vec_id,
           cast(floor(1000000.0 * {nrm2}) AS bigint) AS n2_micro
    FROM rows_d
),
n_rows AS (SELECT cast(count(*) AS bigint) AS n FROM rows_d),
per_dim AS (
    -- per-(row, dim) contributions are floor-quantized micros, so these
    -- accumulators are exact bigints (mergeable partials, order-proof)
    SELECT j AS dim, cast(sum(x_micro) AS bigint) AS s_micro,
           cast(sum(x2_micro) AS bigint) AS q_micro
    FROM comps GROUP BY j
),
means AS (
    SELECT p.dim, p.s_micro, p.q_micro,
           p.s_micro {idiv} r.n AS mean_micro
    FROM per_dim p CROSS JOIN n_rows r
),
tot AS (
    -- 64-row reductions, all exact bigints (mean_micro^2 is exact)
    SELECT cast(sum(q_micro) AS bigint) AS energy_micro,
           cast(max(q_micro) AS bigint) AS top_dim_energy_micro,
           cast(sum(mean_micro * mean_micro) AS bigint) AS meansq_micro2
    FROM means
),
mean_norm AS (
    SELECT cast(sum(n2_micro) AS bigint) AS sum_n2_micro FROM norms
)
SELECT m.dim, m.s_micro, m.q_micro, m.mean_micro,
       (1000000 * m.q_micro) {idiv} t.energy_micro AS energy_share_micro,
       -- anisotropy of the space: ||mean||^2 / E[||x||^2] in micros
       -- (0 for a centered/isotropic cloud, 1e6 if the cloud collapses
       -- to a point) — a corpus-level scalar repeated per row
       cast(floor(cast(t.meansq_micro2 AS double) * r.n
                  / cast(mn.sum_n2_micro AS double)) AS bigint)
           AS anisotropy_micro,
       (1000000 * t.top_dim_energy_micro) {idiv} t.energy_micro
           AS top_dim_share_micro
FROM means m
CROSS JOIN n_rows r CROSS JOIN tot t CROSS JOIN mean_norm mn
"""


@register("embedding_isotropy_probe", oracle=_isotropy_sql("duckdb"))
def embedding_isotropy_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space isotropy QC — the health check run before trusting
    cosine similarity on a new embedding column: per-dimension mean and
    energy (is one dimension hoarding the variance? the 'rogue
    dimension' failure), the top-dimension energy share, and the
    anisotropy ratio ||mean||²/E[||x||²] (embeddings clustered in a
    narrow cone score high; all-but-the-top exists because this is
    routinely non-zero). One scan: per-(row, dim) contributions are
    floor-quantized to micros, so the 64 per-dim accumulators are exact
    bigints — mergeable partials, engine-order-proof (the PCA-step
    pattern). Everything after the scan is 64-row arithmetic."""
    load_table(spark, sf_dir, "embeddings").createOrReplaceTempView(
        "embeddings"
    )
    return spark.sql(_isotropy_sql("spark"))


# ---------------------------------------------------------------------------
# stratified k-fold assignment


_KFOLDS = 5


def _kfold_sql(dialect: str) -> str:
    s = _s(dialect)
    h = _h32(dialect, f"concat(cast(doc_id AS {s}), ':fold')")
    return f"""
WITH keyed AS (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
                              ORDER BY {h}, doc_id) AS rk
    FROM documents
),
assigned AS (
    SELECT doc_id, lang,
           cast((rk - 1) % {_KFOLDS} AS int) AS fold
    FROM keyed
)
SELECT lang, fold, cast(count(*) AS bigint) AS n_docs,
       cast(max(count(*)) OVER (PARTITION BY lang)
            - min(count(*)) OVER (PARTITION BY lang) AS bigint)
           AS stratum_imbalance
FROM assigned
GROUP BY lang, fold
"""


@register("stratified_kfold_assign", oracle=_kfold_sql("duckdb"))
def stratified_kfold_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified k-fold assignment: within each stratum (language),
    docs are ranked by a deterministic hash and dealt round-robin into
    k=5 folds — every fold gets an equal share of every stratum (sizes
    within a stratum differ by at most 1, the output states the measured
    imbalance so a probe can pin it). The rank window shuffles once on
    the stratum key — the same shape as any per-group sequencing — and
    the hash ordering makes the assignment reproducible under any
    partitioning, which is what makes k-fold results comparable across
    runs and engines. The companion split ops are train_val_split
    (2-way by hash threshold) and entity_split_check (leakage audit)."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "documents"
    )
    return spark.sql(_kfold_sql("spark"))
