"""Unit tests for dedup/similarity/multimodal operators on tiny frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chilekids_etl_pipeline_spark.operators.dedup import (
    exact_duplicates,
    hamming_near_pairs,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_bands,
    shingle_rows,
    simhash,
    verify_jaccard,
)
from chilekids_etl_pipeline_spark.operators.multimodal import (
    decode_stub,
    extract_features,
    frame_sample_plan,
    to_media_frame,
)
from chilekids_etl_pipeline_spark.operators.similarity import topk_cosine


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c"), (3, "x y z")])
    got = {r.doc_id: (r.canonical_doc_id, r.is_dup) for r in exact_duplicates(df).collect()}
    assert got == {1: (1, False), 2: (1, True), 3: (3, False)}


def test_jaccard_identical_docs_is_one(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b c d e"), (3, "q r s t u")])
    sh = shingle_rows(df)
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(sh, 0.5).collect()}
    assert pairs == {(1, 2): 1.0}


def test_minhash_lsh_finds_identical_pair(spark):
    df = _docs(spark, [(1, "a b c d e f g"), (2, "a b c d e f g"), (3, "q r s t u v w")])
    sh = shingle_rows(df)
    cand = lsh_candidate_pairs(minhash_bands(sh))
    got = {(r.doc_a, r.doc_b) for r in cand.collect()}
    assert (1, 2) in got
    verified = {(r.doc_a, r.doc_b): r.jaccard for r in verify_jaccard(cand, sh, 0.5).collect()}
    assert verified[(1, 2)] == 1.0


def test_simhash_identical_and_near(spark):
    df = _docs(spark, [(1, "a b c d e"), (2, "a b c d e"), (3, "a b c d f")])
    sigs = {r.doc_id: r.simhash for r in simhash(df).collect()}
    assert sigs[1] == sigs[2]
    assert len(sigs[1]) == 16
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in hamming_near_pairs(simhash(df), 3).collect()}
    assert pairs[(1, 2)] == 0


def test_topk_cosine_orders_by_similarity(spark):
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.1]),
        (3, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    q = df.filter(F.col("vec_id") == 1)
    got = [(r.neighbor_id, r.rank) for r in topk_cosine(q, df, k=2).collect()]
    assert got == [(2, 1), (3, 2)]


def test_topk_cosine_empty_query_side_returns_empty(spark):
    """An empty probe set is a no-op, not a numpy AxisError (r6 advisor)."""
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    got = topk_cosine(df.filter(F.col("vec_id") > 99), df, k=2)
    assert got.collect() == []
    assert [f.name for f in got.schema.fields] == [
        "query_id", "neighbor_id", "rank", "cosine",
    ]


def test_topk_cosine_preserves_id_type(spark):
    """Non-bigint id columns must survive the Arrow boundary — the schema
    is derived from the inputs, not hardcoded long (r6 advisor)."""
    rows = [("a", [1.0, 0.0]), ("b", [1.0, 0.1]), ("c", [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id string, vec array<double>")
    q = df.filter(F.col("vec_id") == "a")
    out = topk_cosine(q, df, k=2)
    assert dict(out.dtypes)["query_id"] == "string"
    assert dict(out.dtypes)["neighbor_id"] == "string"
    got = [(r.neighbor_id, r.rank) for r in out.collect()]
    assert got == [("b", 1), ("c", 2)]


def test_prefix_top1_full_vs_truncated(spark):
    """Matryoshka kernel: the full-dim top-1 and the prefix-dim top-1
    disagree exactly when the discriminating signal lives beyond the
    prefix, and the prefix pick's FULL cosine is reported for regret."""
    from chilekids_etl_pipeline_spark.operators.similarity import (
        prefix_top1,
    )

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),       # probe
        (2, [1.0, 0.0, 0.0, 0.9]),       # same 2-dim prefix, far in full
        (3, [0.9, 0.1, 0.0, 0.0]),       # true full-dim nearest
    ]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    probes = df.filter(F.col("vec_id") == 1)
    got = {
        (r.probe_id, r.d): r
        for r in prefix_top1(probes, df, (2, 4)).collect()
    }
    assert set(got) == {(1, 2), (1, 4)}
    # full-dim search agrees at every d (it ignores d by construction)
    assert got[(1, 2)].full_top1 == 3 and got[(1, 4)].full_top1 == 3
    # at d=2, vec 2 ties vec 1's direction exactly (cos 1.0) and beats 3
    assert got[(1, 2)].pref_top1 == 2
    assert got[(1, 2)].pref_top1_cos == 1.0
    # regret input: vec 2's FULL cosine, lower than vec 3's
    assert got[(1, 2)].pref_top1_full_cos < got[(1, 2)].full_top1_cos
    # at full d the truncated search is the full search
    assert got[(1, 4)].pref_top1 == 3
    assert got[(1, 4)].pref_top1_cos == got[(1, 4)].full_top1_cos


def test_topk_cosine_refuses_oversized_query_side(spark):
    """The exact baseline broadcasts its query side; beyond the bound it
    must refuse with a pointer to the ANN paths, not plan a broadcast that
    OOMs an executor at scale."""
    rows = [(i, [float(i), 1.0]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    with pytest.raises(ValueError, match="ann_lsh_topk"):
        topk_cosine(df, df, k=2, max_queries=5)


def test_ann_planes_widths():
    """Corpus-adaptive signature width: 12 planes up to 262144 vectors
    (gate scales unchanged), then log2(n/64) so E[bucket] stays ≤ 64
    instead of degrading into within-bucket brute force (r9 verdict #3)."""
    from chilekids_etl_pipeline_spark.plans.llmdata import _ann_planes

    assert _ann_planes(10_000) == 12
    assert _ann_planes(100_000) == 12
    assert _ann_planes(262_144) == 12  # 64 * 2^12 boundary, exact
    assert _ann_planes(262_145) == 13
    assert _ann_planes(10_000_000) == 18
    assert _ann_planes(1_000_000_000) == 24
    assert _ann_planes(0) == 12  # degenerate corpora floor at 12


def test_ann_lsh_topk_wider_signature(spark):
    """The operator honors a >12-plane width: identical vectors still
    share their (now longer) signature and rank each other top-1."""
    from chilekids_etl_pipeline_spark.operators.similarity import ann_lsh_topk

    rows = [(i, [float(i % 7 + 1), float(i % 3), 1.0]) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, vec array<double>")
    queries = df.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "vec"
    )
    got = {r.query_id: r for r in ann_lsh_topk(queries, df, k=1, num_planes=13).collect()}
    assert set(got) == {1000, 1001, 1002}
    # each query is an exact copy of vec_id - 1000 → same 13-bit bucket,
    # cosine 1.0; ties break by ascending neighbor_id so the lowest
    # colinear corpus id wins (vectors repeat with period 21: 0 ≡ 21)
    for qid, r in got.items():
        assert r.cosine == 1.0
        assert r.neighbor_id == qid - 1000


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        decode_stub(b"bytes", "image")


def test_multimodal_pipeline(spark):
    docs = _docs(spark, [(0, "aaa"), (1, "bbbb"), (2, "cc")])
    media = to_media_frame(docs)
    rows = {r.doc_id: r for r in media.collect()}
    assert rows[0].media_type == "image" and rows[0].byte_len == 3
    assert rows[1].media_type == "audio" and rows[1].payload == b"bbbb"

    feats = extract_features(media, fake=True, dim=4).collect()
    by_id = {r.doc_id: r.feature for r in feats}
    assert len(by_id[0]) == 4
    assert all(0.0 <= v <= 1.0 for v in by_id[0])
    # deterministic: same payload → same fake feature
    assert by_id[0] == decode_stub(b"aaa", "image", fake=True, dim=4)

    offs = {r.doc_id: r.frame_offsets for r in frame_sample_plan(media, 2, 3).collect()}
    assert offs[1] == [0, 2]  # 4 bytes, every 2, capped

    from chilekids_etl_pipeline_spark.operators.multimodal import resize_media, resize_stub

    with pytest.raises(NotImplementedError):
        resize_stub(b"bytes", "image", 8, 8)
    resized = {r.doc_id: r for r in resize_media(media, 8, 8, fake=True).collect()}
    assert resized[0].payload.startswith(b"resized:8x8:")
    assert resized[0].byte_len == len(resized[0].payload)


def test_frame_sample_plan_empty_payload(spark):
    # byte_len = 0 must yield an empty offset plan, not an illegal sequence
    docs = _docs(spark, [(0, ""), (1, "xyz")])
    media = to_media_frame(docs)
    offs = {r.doc_id: r.frame_offsets for r in frame_sample_plan(media, 2, 3).collect()}
    assert offs[0] == []
    assert offs[1] == [0, 2]


def test_streaming_incremental(spark, tmp_path):
    import json

    src = tmp_path / "stream_src"
    src.mkdir()
    events = [
        {"event_id": 1, "ts": "2024-01-01T00:00:00", "user_id": 7, "event_type": "click", "value": 1.5, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:01:00", "user_id": 7, "event_type": "click", "value": 1.5, "props": "{}"},  # dup payload
        {"event_id": 3, "ts": "2024-01-01T00:02:00", "user_id": 8, "event_type": "view", "value": 2.0, "props": "{}"},
    ]
    with open(src / "batch1.json", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")

    from chilekids_etl_pipeline_spark.streaming.incremental import (
        incremental_normalize,
        read_event_stream,
        start_to_memory,
    )

    stream = read_event_stream(spark, str(src))
    assert stream.isStreaming
    q = start_to_memory(incremental_normalize(stream), "staging_stream_t")
    q.awaitTermination(60)
    out = spark.sql("SELECT * FROM staging_stream_t").collect()
    # event 2 is a payload-duplicate of event 1 → deduped
    assert sorted(r.raw_id for r in out) == [1, 3]
    amounts = {r.raw_id: str(r.amount) for r in out}
    assert amounts[1] == "1.50"


def test_connected_components_chains_and_islands(spark):
    from chilekids_etl_pipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain → component 1
         (10, 11),                    # pair → component 10
         (20, 21), (21, 22), (20, 22)],  # triangle → component 20
        "doc_a long, doc_b long",
    )
    got = {r.doc_id: r.component for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_star_deep_chain(spark):
    """Large-star/small-star handles a diameter-40 chain that min-label
    propagation (diameter-bounded, default max_iter=20) cannot."""
    from chilekids_etl_pipeline_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = [(i, i + 1) for i in range(1, 41)]  # 1-2-3-...-41
    extra = [(100, 101), (101, 102), (100, 102)]
    pairs = spark.createDataFrame(chain + extra, "doc_a long, doc_b long")
    got = {r.doc_id: r.component for r in connected_components_star(pairs).collect()}
    assert got == {**{i: 1 for i in range(1, 42)}, 100: 100, 101: 100, 102: 100}
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=5)


def test_pandas_udf_cosine_matches_jvm_expr(spark):
    """The Arrow-batched Pandas-UDF path (for when vector math must leave
    the JVM: real model inference, library kernels) agrees with the
    pure-Column zip_with/aggregate implementation."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from chilekids_etl_pipeline_spark.operators.similarity import dot_expr

    # PEP 563 (module-level `from __future__ import annotations`) stringifies
    # hints, which pandas_udf can't resolve from test locals — set real ones.
    def _np_dot(a, b):
        return pd.Series([float(np.dot(x, y)) for x, y in zip(a, b)])

    _np_dot.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    np_dot = pandas_udf(_np_dot, "double")

    rows = [(i, [float(i), 1.0, 2.0], [0.5, float(i), 1.0]) for i in range(100)]
    df = spark.createDataFrame(rows, "id long, a array<double>, b array<double>")
    out = df.select(
        "id",
        np_dot("a", "b").alias("py"),
        dot_expr("a", "b").alias("jvm"),
    ).collect()
    for r in out:
        assert abs(r.py - r.jvm) < 1e-9


def test_sketch_hash_expressions_match_duckdb_on_fuzz(spark):
    """The portable sketch primitives (CMS bucket, HLL register index /
    rank field / rho, the split-assignment hash) must evaluate
    IDENTICALLY in Spark and DuckDB on arbitrary strings — every sketch
    entry's cross-engine correctness reduces to this property. Fuzzed
    over printable text including quotes-free unicode-ish content."""
    import duckdb as _duckdb

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from chilekids_etl_pipeline_spark.functions.sketch import (
        cms_bucket_sql,
        hll_bucket_sql,
        hll_rho_sql,
        hll_w_sql,
    )

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.text(
                st.sampled_from(list("abcXYZ019 _-#.:!@~")),
                min_size=0,
                max_size=24,
            ),
            min_size=1,
            max_size=12,
        )
    )
    def inner(values):
        df = spark.createDataFrame([(v,) for v in values], "s string")
        spark_rows = df.selectExpr(
            f"{cms_bucket_sql('spark', '0', 's')} AS cms0",
            f"{cms_bucket_sql('spark', '3', 's')} AS cms3",
            "md5(s) AS h",
        ).selectExpr(
            "cms0",
            "cms3",
            f"{hll_bucket_sql('spark')} AS bucket",
            f"{hll_w_sql('spark')} AS w",
        ).selectExpr(
            "cms0", "cms3", "bucket", f"{hll_rho_sql()} AS rho"
        ).collect()
        got = [(r.cms0, r.cms3, r.bucket, r.rho) for r in spark_rows]

        con = _duckdb.connect()
        con.execute("CREATE TABLE t(s VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?)", [(v,) for v in values])
        want = con.execute(
            f"SELECT cms0, cms3, bucket, {hll_rho_sql()} AS rho FROM ("
            f"SELECT cms0, cms3, {hll_bucket_sql('duckdb')} AS bucket, "
            f"{hll_w_sql('duckdb')} AS w FROM ("
            f"SELECT {cms_bucket_sql('duckdb', '0', 's')} AS cms0, "
            f"{cms_bucket_sql('duckdb', '3', 's')} AS cms3, "
            f"md5(s) AS h FROM t) a) b"
        ).fetchall()
        assert got == [tuple(r) for r in want]

    inner()


def test_jaccard_df_cap_drops_hot_shingle(spark):
    """A boilerplate shingle shared by every doc must not create pairs:
    with df_cap_denom the hot shingle is anti-joined out BEFORE the
    self-join, so the planted footer links nothing (VERDICT r5 #2)."""
    footer = "all rights reserved"
    rows = [(i, f"u{i} v{i} w{i} {footer}") for i in range(1, 41)]
    rows += [(100, "p q r s t"), (101, "p q r s t")]
    sh = shingle_rows(_docs(spark, rows))
    # uncapped: the footer 3-gram joins all 40 boilerplate docs pairwise
    uncapped = jaccard_pairs(sh, 0.0).count()
    assert uncapped > 700  # 40*39/2 hot pairs + the true dup
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(sh, 0.5, df_cap_denom=20).collect()
    }
    # only the genuine duplicate pair survives, at jaccard 1.0
    assert capped == {(100, 101): 1.0}


def test_band_topk_cosine_null_labels_drop_like_sql(spark):
    """SQL three-valued `<>`: a NULL exclude label on either side yields
    UNKNOWN and the pair is dropped. numpy's None!='x' / NaN!=NaN would
    keep such pairs (r7 advisor)."""
    from chilekids_etl_pipeline_spark.operators.similarity import (
        band_topk_cosine,
    )

    rows = [
        (1, [1.0, 0.0], "a"),     # query
        (2, [1.0, 0.05], None),   # near, null label -> must drop
        (3, [1.0, 0.1], "b"),     # near, different label -> keeps
        (4, [1.0, 0.15], "a"),    # near, same label -> drops
        (5, [1.0, 0.2], None),    # query with null label -> emits nothing
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, vec array<double>, label string"
    )
    q = df.filter(F.col("vec_id").isin(1, 5))
    got = [
        (r.query_id, r.neighbor_id)
        for r in band_topk_cosine(
            q, df, n=5, lo=0.5, hi=1.0, exclude_col="label"
        ).collect()
    ]
    assert got == [(1, 3)]


def test_jaccard_abs_df_cap_bounds_bucket_size(spark):
    """df_cap_abs drops shingles above an ABSOLUTE document frequency —
    the linear-work guard for corpora where shingle df grows with corpus
    size (round-8 scaling curve: relative cap alone left pair work
    superlinear, 113x pair rows over a 10x step)."""
    # 30 docs share one moderately-hot shingle (df=30, under the n/2
    # relative cap here) plus unique content; one true dup pair
    hot = "alpha beta gamma"
    rows = [(i, f"x{i} y{i} z{i} {hot}") for i in range(1, 31)]
    rows += [(100, "p q r s t"), (101, "p q r s t")]
    sh = shingle_rows(_docs(spark, rows))
    # relative-only at denom=1 (cap = n = 32, nothing dropped): hot pairs
    rel_only = jaccard_pairs(sh, 0.0, df_cap_denom=1).count()
    assert rel_only > 400  # 30*29/2 hot pairs + the dup
    # absolute cap 10 removes the df=30 shingle; only the true dup stays
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(sh, 0.5, df_cap_denom=1,
                               df_cap_abs=10).collect()
    }
    assert capped == {(100, 101): 1.0}


def test_record_linkage_distributed_equals_single_window(spark):
    """The distributed sorted-neighborhood construction (range partitions
    + per-(pid, nation) body windows + boundary strip) must reproduce the
    single-window per-nation form EXACTLY — the strip argument in the
    docstring, verified pair-for-pair at two scales. sf0.001 is the
    stress case: ~154 rows over 32 range partitions means most (pid,
    nation) segments are 1-2 rows, so nearly every pair crosses a
    partition boundary."""
    from chilekids_etl_pipeline_spark.plans.llmdata7 import (
        _linkage_sql,
        record_linkage_blocked,
    )

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        got = {
            tuple(r)
            for r in record_linkage_blocked(spark, sf_dir).collect()
        }
        want = {tuple(r) for r in spark.sql(_linkage_sql("spark")).collect()}
        assert got == want, (
            f"{sf_dir}: {len(got - want)} extra, {len(want - got)} missing"
        )
        planted = [p for p in got if p[1] == p[0] + 900000]
        assert planted and all(p[4] == 1 for p in planted)
