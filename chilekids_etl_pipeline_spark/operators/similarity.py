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


#: Hard bound on the broadcast query side of the exact baseline. Beyond
#: this, the crossJoin's scored-pair count (|queries| × |corpus|) stops
#: being a "small probe set against a big corpus" and the right tool is an
#: ANN path. The bound is deliberately conservative: 100k × 128-dim floats
#: is ~100 MB broadcast, near the default executor comfort zone.
MAX_BRUTE_FORCE_QUERIES = 100_000


def topk_cosine(
    queries: DataFrame,
    corpus: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    max_queries: int = MAX_BRUTE_FORCE_QUERIES,
) -> DataFrame:
    """Exact top-k cosine neighbors per query (self-match excluded).

    The query matrix broadcasts to every corpus partition; each Arrow
    batch scores ALL queries against its vectors with one BLAS matrix
    multiply (``mapInPandas`` — the sanctioned vectorized-UDF path for
    dense linear algebra, where per-pair Catalyst ``zip_with`` folds
    allocate an array per pair and measured 4x slower than DuckDB at
    sf1; the matmul form is ~40x faster than both). Each partition emits
    only its per-query top-k (score desc, id asc — the same total order
    as the final ranking, so the partial top-k is merge-safe), and a
    metadata-scale window merges the partials. Scores are rounded to 6
    decimals before ranking, like the oracle.

    This is the EXACT-RECALL BASELINE: cost is |queries| × |corpus|
    scored pairs, linear in the corpus but also linear in the broadcast
    query set. The query side is therefore bounded (``max_queries``) and
    the operator refuses larger probe sets rather than silently planning
    a broadcast that OOMs an executor — use ``ann_lsh_topk`` or
    ``ann_ivf_topk`` for large query sets.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    # id columns keep their INPUT types (query ids from `queries`, neighbor
    # ids from `corpus`) — hardcoding long would silently corrupt string or
    # int ids at the Arrow boundary.
    qid_t = queries.schema[id_col].dataType.simpleString()
    nid_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {qid_t}, neighbor_id {nid_t}, cosine double"

    qpd = (
        queries.select(F.col(id_col), F.col(vec_col))
        .limit(max_queries + 1)
        .toPandas()
    )
    if len(qpd) > max_queries:
        raise ValueError(
            f"topk_cosine is the exact brute-force baseline: the query side "
            f"broadcasts and must stay <= {max_queries} rows (got more). Use "
            f"ann_lsh_topk (hyperplane-LSH buckets) or ann_ivf_topk (IVF "
            f"cells) for large query sets."
        )
    if len(qpd) == 0:
        return spark.createDataFrame(
            [], schema=f"query_id {qid_t}, neighbor_id {nid_t}, "
            "rank int, cosine double"
        )
    qids = qpd[id_col].to_numpy()
    qmat = np.array(qpd[vec_col].tolist(), dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    bq = spark.sparkContext.broadcast((qids, qmat, qnorm))

    def _round6(x):
        # HALF-AWAY-FROM-ZERO to match F.round / DuckDB round; np.round is
        # half-to-even and diverges on exact .5e-6 ties.
        return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6

    def _score_partition(batches):
        b_qids, b_qmat, b_qnorm = bq.value
        nq = len(b_qids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cids = pdf[id_col].to_numpy()
            cnorm = np.sqrt((cmat * cmat).sum(axis=1))
            scores = _round6((cmat @ b_qmat.T) / np.outer(cnorm, b_qnorm))
            out_q, out_n, out_s = [], [], []
            for j in range(nq):
                keep = np.nonzero(cids != b_qids[j])[0]
                if keep.size == 0:
                    continue
                # (score desc, neighbor id asc) — the final total order
                order = np.lexsort((cids[keep], -scores[keep, j]))[:k]
                sel = keep[order]
                out_q.append(np.full(sel.size, b_qids[j]))
                out_n.append(cids[sel])
                out_s.append(scores[sel, j])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_s),
                    }
                )

    partials = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _score_partition, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def band_topk_cosine(
    queries: DataFrame,
    corpus: DataFrame,
    n: int,
    lo: float,
    hi: float,
    id_col: str = "vec_id",
    vec_col: str = "vec",
    exclude_col: str | None = None,
    max_queries: int = MAX_BRUTE_FORCE_QUERIES,
) -> DataFrame:
    """Exact top-n neighbors per query restricted to a cosine band
    ``lo <= cos < hi`` — the semi-hard-negative selection rule from
    contrastive-training practice (too-similar items are likely true
    positives/duplicates; too-dissimilar ones are uninformative easy
    negatives). ``exclude_col`` (e.g. a class label) drops candidates
    that share the query's value — those are positives, not negatives.

    Same execution shape as ``topk_cosine``: the bounded query matrix
    broadcasts, each corpus partition scores all queries with one BLAS
    matmul, applies the band + label mask, and emits only its per-query
    top-n under the (cos desc, id asc) total order; a metadata-scale
    window merges partials. The band test runs on the ROUNDED cosine so
    engine-edge candidates land on the same side as the oracle's.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    qid_t = queries.schema[id_col].dataType.simpleString()
    nid_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = f"query_id {qid_t}, neighbor_id {nid_t}, cosine double"
    qcols = [F.col(id_col), F.col(vec_col)]
    if exclude_col is not None:
        qcols.append(F.col(exclude_col))
    qpd = queries.select(*qcols).limit(max_queries + 1).toPandas()
    if len(qpd) > max_queries:
        raise ValueError(
            f"band_topk_cosine broadcasts its query side and must stay <= "
            f"{max_queries} rows (got more); sample the probe set harder or "
            f"use the ANN paths."
        )
    if len(qpd) == 0:
        return spark.createDataFrame(
            [], schema=f"query_id {qid_t}, neighbor_id {nid_t}, "
            "rank int, cosine double"
        )
    qids = qpd[id_col].to_numpy()
    qmat = np.array(qpd[vec_col].tolist(), dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qexc = qpd[exclude_col].to_numpy() if exclude_col is not None else None
    bq = spark.sparkContext.broadcast((qids, qmat, qnorm, qexc))

    def _round6(x):
        # half-away-from-zero: matches DuckDB round(x, 6) / F.round
        return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6

    def _score_partition(batches):
        b_qids, b_qmat, b_qnorm, b_qexc = bq.value
        nq = len(b_qids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cids = pdf[id_col].to_numpy()
            cexc = (
                pdf[exclude_col].to_numpy() if exclude_col is not None else None
            )
            # null-label mask, once per batch (pandas notna covers None/NaN)
            c_nonnull = pd.notna(pdf[exclude_col]).to_numpy() if cexc is not None else None
            cnorm = np.sqrt((cmat * cmat).sum(axis=1))
            scores = _round6((cmat @ b_qmat.T) / np.outer(cnorm, b_qnorm))
            out_q, out_n, out_s = [], [], []
            for j in range(nq):
                mask = (
                    (cids != b_qids[j])
                    & (scores[:, j] >= lo)
                    & (scores[:, j] < hi)
                )
                if cexc is not None:
                    # SQL three-valued `<>`: a NULL label on either side
                    # yields UNKNOWN and the row is dropped. numpy would
                    # keep None != 'x' and NaN != NaN pairs, so mask null
                    # labels out explicitly before the inequality test.
                    qv = b_qexc[j]
                    if qv is None or (isinstance(qv, float) and qv != qv):
                        continue
                    mask &= c_nonnull & (cexc != qv)
                keep = np.nonzero(mask)[0]
                if keep.size == 0:
                    continue
                order = np.lexsort((cids[keep], -scores[keep, j]))[:n]
                sel = keep[order]
                out_q.append(np.full(sel.size, b_qids[j]))
                out_n.append(cids[sel])
                out_s.append(scores[sel, j])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neighbor_id": np.concatenate(out_n),
                        "cosine": np.concatenate(out_s),
                    }
                )

    ccols = [F.col(id_col), F.col(vec_col)]
    if exclude_col is not None:
        ccols.append(F.col(exclude_col))
    partials = corpus.select(*ccols).mapInPandas(_score_partition, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        partials.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def prefix_top1(
    probes: DataFrame,
    corpus: DataFrame,
    dims: tuple[int, ...],
    id_col: str = "vec_id",
    vec_col: str = "vec",
    max_probes: int = MAX_BRUTE_FORCE_QUERIES,
) -> DataFrame:
    """Per (probe, prefix-dim): the exact top-1 neighbor under BOTH the
    full-dimension cosine and the prefix-truncated cosine — the inner
    scan of Matryoshka truncation-fidelity measurement.

    Same execution shape as ``topk_cosine``: the (small, hash-sampled)
    probe matrix broadcasts, each corpus partition scores all probes
    with one BLAS matmul per prefix dim (the prefix score is a matmul
    over the leading ``d`` columns — no per-pair array allocation), and
    emits one partial top-1 row per (probe, dim); a metadata-scale
    window merges partials under the same (score desc, id asc) total
    order the partials were taken in, so the merge is exact.

    Output: (probe_id, d, full_top1, full_top1_cos, pref_top1,
    pref_top1_cos, pref_top1_full_cos), one row per probe x dim.
    Cosines are rounded half-away-from-zero to 6 decimals BEFORE
    ranking, like the DuckDB oracle ranks its rounded values.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    pid_t = probes.schema[id_col].dataType.simpleString()
    nid_t = corpus.schema[id_col].dataType.simpleString()
    out_schema = (
        f"probe_id {pid_t}, d int, full_top1 {nid_t}, full_top1_cos double, "
        f"pref_top1 {nid_t}, pref_top1_cos double, pref_top1_full_cos double"
    )
    ppd = (
        probes.select(F.col(id_col), F.col(vec_col))
        .limit(max_probes + 1)
        .toPandas()
    )
    if len(ppd) > max_probes:
        raise ValueError(
            f"prefix_top1 broadcasts its probe side and must stay <= "
            f"{max_probes} rows (got more); sample the probe set harder."
        )
    if len(ppd) == 0:
        return spark.createDataFrame([], schema=out_schema)
    pids = ppd[id_col].to_numpy()
    pmat = np.array(ppd[vec_col].tolist(), dtype=np.float64)
    bq = spark.sparkContext.broadcast((pids, pmat))
    dims_t = tuple(int(d) for d in dims)

    def _round6(x):
        # half-away-from-zero: matches DuckDB round(x, 6) / F.round
        return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6

    def _partials(batches):
        b_pids, b_pmat = bq.value
        npr = len(b_pids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cmat = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            cids = pdf[id_col].to_numpy()
            # one matmul per dim over the leading columns; norms per dim
            per_dim = {}
            for d in dims_t:
                cp, pp = cmat[:, :d], b_pmat[:, :d]
                cn = np.sqrt((cp * cp).sum(axis=1))
                pn = np.sqrt((pp * pp).sum(axis=1))
                per_dim[d] = _round6((cp @ pp.T) / np.outer(cn, pn))
            full_d = cmat.shape[1]
            cf, pf = cmat, b_pmat
            cn = np.sqrt((cf * cf).sum(axis=1))
            pn = np.sqrt((pf * pf).sum(axis=1))
            s_full = _round6((cf @ pf.T) / np.outer(cn, pn))
            rows = {
                "probe_id": [], "d": [], "full_top1": [],
                "full_top1_cos": [], "pref_top1": [], "pref_top1_cos": [],
                "pref_top1_full_cos": [],
            }
            for j in range(npr):
                keep = np.nonzero(cids != b_pids[j])[0]
                if keep.size == 0:
                    continue
                # (score desc, cand id asc) — the merge's total order
                i_full = keep[
                    np.lexsort((cids[keep], -s_full[keep, j]))[0]
                ]
                for d in dims_t:
                    sd = per_dim[d]
                    i_pref = keep[
                        np.lexsort((cids[keep], -sd[keep, j]))[0]
                    ]
                    rows["probe_id"].append(b_pids[j])
                    rows["d"].append(d)
                    rows["full_top1"].append(cids[i_full])
                    rows["full_top1_cos"].append(s_full[i_full, j])
                    rows["pref_top1"].append(cids[i_pref])
                    rows["pref_top1_cos"].append(sd[i_pref, j])
                    rows["pref_top1_full_cos"].append(s_full[i_pref, j])
            if rows["probe_id"]:
                yield pd.DataFrame(rows)

    partials = corpus.select(F.col(id_col), F.col(vec_col)).mapInPandas(
        _partials, out_schema
    )
    # one shuffle merges both partial top-1s: struct-min under
    # (-cos, id) is exactly (cos desc, id asc), and the original cos
    # rides along so no double negation can flip a 0.0 sign bit. Two
    # window branches would re-run the scoring map once per branch.
    mf = F.min(
        F.struct(
            (-F.col("full_top1_cos")).alias("nc"),
            F.col("full_top1").alias("id"),
            F.col("full_top1_cos").alias("cos"),
        )
    ).alias("mf")
    mp = F.min(
        F.struct(
            (-F.col("pref_top1_cos")).alias("nc"),
            F.col("pref_top1").alias("id"),
            F.col("pref_top1_cos").alias("cos"),
            F.col("pref_top1_full_cos").alias("fc"),
        )
    ).alias("mp")
    return (
        partials.groupBy("probe_id", "d")
        .agg(mf, mp)
        .select(
            "probe_id", "d",
            F.col("mf.id").alias("full_top1"),
            F.col("mf.cos").alias("full_top1_cos"),
            F.col("mp.id").alias("pref_top1"),
            F.col("mp.cos").alias("pref_top1_cos"),
            F.col("mp.fc").alias("pref_top1_full_cos"),
        )
    )


def _hyperplane_bits(df: DataFrame, num_planes: int, id_col: str, vec_col: str) -> DataFrame:
    """(id, p, bit) — sign bit of each deterministic Rademacher hyperplane.

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
    return contrib.groupBy(id_col, "p").agg(
        F.when(F.sum("c") >= 0, F.lit("1")).otherwise(F.lit("0")).alias("bit")
    )


def hyperplane_signature(df: DataFrame, num_planes: int = 12, id_col: str = "vec_id", vec_col: str = "vec") -> DataFrame:
    """Deterministic hyperplane LSH signature as one num_planes-bit string."""
    bits = _hyperplane_bits(df, num_planes, id_col, vec_col)
    return bits.groupBy(id_col).agg(
        F.array_join(
            F.transform(F.array_sort(F.collect_list(F.struct("p", "bit"))), lambda x: x["bit"]),
            "",
        ).alias("sig")
    )


def hyperplane_bands(
    df: DataFrame,
    num_planes: int = 12,
    band_size: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """(id, band, band_sig): hyperplane bits grouped into OR-amplified bands.

    Same banding trick as MinHash LSH: two vectors are candidates if ANY
    band of ``band_size`` consecutive plane bits matches, which keeps
    recall high for near-identical vectors (a band misses only when one of
    its few planes flips) while the equi-join on (band, band_sig) keeps
    candidate generation bucketed — never a cross join.
    """
    bits = _hyperplane_bits(df, num_planes, id_col, vec_col)
    return (
        bits.withColumn("band", F.expr(f"p DIV {band_size}"))
        .groupBy(id_col, "band")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list(F.struct("p", "bit"))), lambda x: x["bit"]),
                "",
            ).alias("band_sig")
        )
    )


def ivf_assignments(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """Rank every centroid per vector by cosine (IVF coarse quantizer).

    Output: (id, centroid_id, crank) — crank 1 is the vector's cell;
    crank ≤ nprobe are a query's probe set. Centroids broadcast (they are
    tiny — k·dim floats even for k=65536); each vector is scored against
    all k in one scan, so assignment is a single pass, no shuffle until
    the consumer aggregates.

    At real scale the centroids come from k-means|| on a sample; here they
    are picked deterministically so the oracle can reproduce the index.
    """
    c = with_norm(centroids, vec_col, "cnorm").select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("cv"), "cnorm"
    )
    v = with_norm(vectors, vec_col, "vnorm")
    scored = v.crossJoin(broadcast(c)).withColumn(
        "ccos", F.round(dot_expr(vec_col, "cv") / (F.col("vnorm") * F.col("cnorm")), 6)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("ccos").desc(), F.col("centroid_id"))
    return scored.withColumn("crank", F.row_number().over(w)).select(
        id_col, "centroid_id", "crank"
    )


def ann_ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    k: int,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "vec",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest-centroid
    cell; a query probes its ``nprobe`` nearest cells and ranks exact cosine
    only within them. The inverted-file join replaces the O(n²) pair space
    with per-cell blocks — with k cells and p probes the scored pairs drop
    by ~p/k, the standard trade against recall (FAISS IVF-Flat recipe)."""
    assign = ivf_assignments(
        queries.unionByName(corpus).dropDuplicates([id_col]), centroids, id_col, vec_col
    )
    cells = assign.filter(F.col("crank") == 1)
    probes = assign.join(
        queries.select(id_col).distinct(), id_col
    ).filter(F.col("crank") <= nprobe)
    q = (
        with_norm(queries, vec_col, "qnorm")
        .join(probes, id_col)
        .select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
            "qnorm", "centroid_id",
        )
    )
    c = (
        with_norm(corpus, vec_col, "cnorm")
        .join(cells, id_col)
        .select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"),
            "cnorm", "centroid_id",
        )
    )
    pairs = c.join(broadcast(q), "centroid_id").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = pairs.withColumn(
        "cosine", F.round(dot_expr("qvec", "cvec") / (F.col("qnorm") * F.col("cnorm")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
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
