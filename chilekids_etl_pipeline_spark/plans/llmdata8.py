"""Training-data pipeline operators, batch 8: deterministic training-
order construction (source-interleaved global positions with NO global
sort) and PMI collocation mining (the statistical phrase detector).

Dual-dialect SQL templates, no Python UDFs. Registered after the
external gate window; rotates next round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.text import words_sql
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# training-order interleave

def _interleave_sql(dialect: str) -> str:
    s = "string" if dialect == "spark" else "varchar"
    return f"""
WITH ranked AS (
    SELECT doc_id, source,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(cast(doc_id AS {s})), doc_id)
               AS rk
    FROM documents
),
src AS (
    SELECT source,
           row_number() OVER (ORDER BY source) AS sidx,
           cast(count(*) OVER () AS bigint) AS n_src
    FROM (SELECT DISTINCT source FROM documents) d
)
SELECT r.doc_id, r.source,
       cast((r.rk - 1) * s.n_src + s.sidx - 1 AS bigint) AS global_pos
FROM ranked r JOIN src s ON r.source = s.source
"""


@register("training_order_interleave", oracle=_interleave_sql("duckdb"))
def training_order_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-interleaved training order: every document
    gets a global position computed PER ROW from (its md5-shuffled rank
    within its source) × n_sources + source index — consecutive
    positions cycle through sources, which is the data-order property
    training stability wants (no wall of one crawl dump mid-run), and
    reruns/engines agree exactly. The point at 100 TB is what this
    AVOIDS: a global ORDER BY rand() sort over the corpus. The only
    shuffles are the per-source rank window and a broadcast join
    against the source index table; writers then range-partition on
    global_pos to emit shards in training order."""
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_interleave_sql("spark"))


# ---------------------------------------------------------------------------
# PMI collocations

_PMI_MIN_PAIR = 10
_PMI_TOP = 50


def _pmi_sql(
    dialect: str,
    allbi_src_override: str | None = None,
    uni_src_override: str | None = None,
) -> str:
    w = words_sql(dialect)
    if dialect == "spark":
        pairs = (
            f"explode(CASE WHEN size({w}) >= 2 THEN "
            f"transform(sequence(1, size({w}) - 1), "
            f"i -> concat(element_at({w}, i), ' ', element_at({w}, i + 1))) "
            f"ELSE array() END)"
        )
        uni = f"explode({w})"
    else:
        pairs = (
            f"unnest(list_transform("
            f"range(1, greatest(len({w}), 1)), "
            f"i -> concat(({w})[i], ' ', ({w})[i + 1])))"
        )
        uni = f"unnest({w})"
    allbi_body = (
        f"SELECT pair, cast(count(*) AS bigint) AS c_ab FROM ("
        f"SELECT {pairs} AS pair FROM documents) p GROUP BY pair"
    )
    uni_body = (
        f"SELECT word, cast(count(*) AS bigint) AS c FROM ("
        f"SELECT {uni} AS word FROM documents) u GROUP BY word"
    )
    allbi_src = allbi_src_override or f"({allbi_body})"
    uni_src = uni_src_override or f"({uni_body})"
    return f"""
WITH allbi AS (SELECT * FROM {allbi_src}),
bi AS (SELECT * FROM allbi WHERE c_ab >= {_PMI_MIN_PAIR}),
uni AS (SELECT * FROM {uni_src}),
tot AS (
    SELECT (SELECT cast(sum(c) AS bigint) FROM uni) AS n_uni,
           (SELECT cast(sum(c_ab) AS bigint) FROM allbi) AS n_bi
),
scored AS (
    SELECT b.pair, b.c_ab, ua.c AS c_a, ub.c AS c_b,
           round(ln((b.c_ab / cast(t.n_bi AS double))
                    / ((ua.c / cast(t.n_uni AS double))
                       * (ub.c / cast(t.n_uni AS double)))), 6) AS pmi
    FROM bi b
    JOIN uni ua ON ua.word = split_part(b.pair, ' ', 1)
    JOIN uni ub ON ub.word = split_part(b.pair, ' ', 2)
    CROSS JOIN tot t
)
SELECT pair, c_ab, c_a, c_b, pmi FROM (
    SELECT pair, c_ab, c_a, c_b, pmi,
           row_number() OVER (ORDER BY pmi DESC, pair) AS rk
    FROM scored
) ranked WHERE rk <= {_PMI_TOP}
"""


@register("cooccurrence_pmi", oracle=_pmi_sql("duckdb"))
def cooccurrence_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by pointwise mutual information over adjacent
    word pairs — the statistical phrase detector (tokenizer vocab
    candidates, multi-word entity discovery, boilerplate phrase
    spotting). Two explode+count aggregations (bigrams, unigrams), a
    support floor on pairs (PMI is noise below ~10 observations), an
    equi-join of each pair to its word marginals, and a top-k over the
    surviving pair table. PMI is rounded to 6 dp BEFORE ranking so the
    ordering is identical across engines; split_part parses the pair
    key identically in both dialects.

    Perf: the unigram table is referenced three times (two marginal
    joins + the total) and the bigram table twice (support filter +
    total) — SQL inlining re-exploded the corpus five times (3.7 s at
    sf0.1); both aggregates are materialized once (→ ~1.3 s)."""
    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    docs.createOrReplaceTempView("documents")
    w = words_sql("spark")
    pairs = (
        f"explode(CASE WHEN size({w}) >= 2 THEN "
        f"transform(sequence(1, size({w}) - 1), "
        f"i -> concat(element_at({w}, i), ' ', element_at({w}, i + 1))) "
        f"ELSE array() END)"
    )
    allbi = spark.sql(
        f"SELECT pair, cast(count(*) AS bigint) AS c_ab FROM "
        f"(SELECT {pairs} AS pair FROM documents) p GROUP BY pair"
    )
    uni = spark.sql(
        f"SELECT word, cast(count(*) AS bigint) AS c FROM "
        f"(SELECT explode({w}) AS word FROM documents) u GROUP BY word"
    )
    allbi.persist().createOrReplaceTempView("pmi_allbi_mat")
    uni.persist().createOrReplaceTempView("pmi_uni_mat")
    return spark.sql(
        _pmi_sql("spark", allbi_src_override="pmi_allbi_mat",
                 uni_src_override="pmi_uni_mat")
    )
