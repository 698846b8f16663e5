"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline; random-hyperplane LSH
bucketing as the scale path (candidates only meet inside a bucket).

All vector math is higher-order array expressions (zip_with + aggregate)
— JVM-side, no Python. Norms are precomputed once per vector, not per
pair. At 100 TB the corpus side stays partitioned; only the (small) query
side broadcasts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.text import HEX

VEC_AS_DOUBLE = "transform(embedding, x -> cast(x AS double))"


def with_norm(df: DataFrame, vec_col: str = "vec", out: str = "norm") -> DataFrame:
    return df.withColumn(
        out,
        F.expr(
            f"sqrt(aggregate(zip_with({vec_col}, {vec_col}, (x, y) -> x * y), "
            f"cast(0 AS double), (acc, x) -> acc + x))"
        ),
    )


def dot_expr(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), cast(0 AS double), (acc, x) -> acc + x)"
    )


def topk_cosine(
    queries: DataFrame, corpus: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "vec"
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    The query side is broadcast; the corpus is scanned once, partitioned.
    Ranking ties broken by neighbor id for determinism.
    """
    q = with_norm(queries, vec_col, "qnorm").select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "qnorm"
    )
    c = with_norm(corpus, vec_col, "cnorm").select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), "cnorm"
    )
    pairs = c.crossJoin(broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cosine", F.round(dot_expr("qvec", "cvec") / (F.col("qnorm") * F.col("cnorm")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_signature(df: DataFrame, num_planes: int = 12, id_col: str = "vec_id", vec_col: str = "vec") -> DataFrame:
    """Deterministic Rademacher (±1) hyperplane LSH signature as a bit string.

    Plane p's weight for dimension d is ±1 from the parity of the first
    hex nibble of md5('p_d') — reproducible in any engine with md5.
    """
    pd_rows = df.select(
        id_col, F.col(vec_col).alias("v"), F.explode(F.sequence(F.lit(0), F.lit(num_planes - 1))).alias("p")
    ).select(id_col, "v", "p", F.explode(F.expr("sequence(0, size(v) - 1)")).alias("d"))
    w = (
        f"(CASE WHEN (position(substr(md5(concat(p, '_', d)), 1, 1), '{HEX}') - 1) % 2 = 0 "
        f"THEN 1.0 ELSE -1.0 END)"
    )
    contrib = pd_rows.withColumn("c", F.expr(f"element_at(v, d + 1) * {w}"))
    bits = contrib.groupBy(id_col, "p").agg(
        F.when(F.sum("c") >= 0, F.lit("1")).otherwise(F.lit("0")).alias("bit")
    )
    return bits.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("p", "bit"))), lambda x: x["bit"]),
            "",
        ).alias("sig")
    )


def ann_lsh_topk(
    queries: DataFrame, corpus: DataFrame, k: int, num_planes: int = 12,
    id_col: str = "vec_id", vec_col: str = "vec",
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to same-bucket
    candidates. Recall < 1 by design; the bucket join replaces the O(n²)
    pair space with per-bucket blocks."""
    all_vecs = queries.unionByName(corpus).dropDuplicates([id_col])
    sigs = hyperplane_signature(all_vecs, num_planes, id_col, vec_col)
    q = (
        with_norm(queries, vec_col, "qnorm")
        .join(sigs, id_col)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"), "qnorm", "sig")
    )
    c = (
        with_norm(corpus, vec_col, "cnorm")
        .join(sigs, id_col)
        .select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"), "cnorm", "sig")
    )
    pairs = c.join(broadcast(q), "sig").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.withColumn(
        "cosine", F.round(dot_expr("qvec", "cvec") / (F.col("qnorm") * F.col("cnorm")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
