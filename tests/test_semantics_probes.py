"""Meaningfulness probes for shared-template operators.

The oracle gate proves Spark == DuckDB, but both sides share the SQL
template — a template bug or a degenerate parameterization passes the
gate while computing something useless (observed twice: a case-sensitive
regex that never lowercased hosts, and a classifier that kept 100% of
documents). These probes pin that the operators' OUTPUTS carry signal,
via the cheap DuckDB side (no Spark session needed).
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from chilekids_etl_pipeline_spark import plans
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def con():
    plans.load_all()
    c = duckdb.connect()
    for p in glob.glob(f"{SF_SMALL}/*.parquet"):
        c.execute(
            f"CREATE VIEW {os.path.basename(p).removesuffix('.parquet')} "
            f"AS SELECT * FROM '{p}'"
        )
    return c


def _oracle(name: str) -> str:
    o = plans.QUERIES[name].oracle
    return o() if callable(o) else o


def test_lang_id_beats_chance(con):
    d = con.execute(_oracle("lang_id")).fetchdf()
    assert d.is_match.mean() > 0.25  # 5 labels -> chance is 0.2


def test_quality_classifier_boundary_splits_corpus(con):
    d = con.execute(_oracle("quality_classifier_score")).fetchdf()
    keep = d.keep.mean()
    assert 0.05 < keep < 0.95, f"degenerate keep rate {keep}"
    assert d.score.min() < 0.5 < d.score.max()


def test_contamination_flags_minority_nonzero(con):
    d = con.execute(_oracle("contamination_check")).fetchdf()
    frac = d.contaminated.mean()
    assert 0 < frac < 0.2, frac


def test_curriculum_buckets_are_roughly_even(con):
    d = con.execute(_oracle("length_curriculum_buckets")).fetchdf()
    counts = d.bucket.value_counts()
    assert len(counts) == 10
    assert counts.min() > 0.5 * counts.max()  # deciles, no empty/hot bucket


def test_url_canonicalization_collapses_variants(con):
    d = con.execute(_oracle("url_canonical_dedup")).fetchdf()
    # the synthesized corpus has case/param/slash variants of 50 paths
    assert d.canonical_url.nunique() < len(d) / 5
    assert d.canonical_url.str.startswith("https://www.").all()
    assert d.is_refetch.any()


def test_lsh_recall_is_high_precision_partial(con):
    d = con.execute(_oracle("dedup_lsh_recall")).fetchdf().iloc[0]
    assert d.recall > 0.7  # bands must catch most true pairs
    assert 0 < d.precision <= 1
    assert d.n_hits <= min(d.n_exact, d.n_cand)


def test_contamination_span_finds_long_runs_in_few_docs(con):
    d = con.execute(_oracle("contamination_span")).fetchdf()
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    # only contaminated docs appear, and they are a small minority
    assert 0 < len(d) < 0.1 * n_docs
    # the span arithmetic is internally consistent (span = run + N-1 words)
    assert (d.max_span_words == d.max_run + 7).all()
    assert (d.max_run <= d.n_contam_grams).all()
    # the benchmark docs themselves are verbatim-contaminated → long runs,
    # not scattered single-gram noise (the thing the SPAN rule exists for)
    assert d.max_run.max() >= 10
    bench_ids = {i for i in d.doc_id if int(i) % 97 == 0}
    assert bench_ids, "no benchmark doc was flagged against its own grams"


def test_token_budget_allocator_budget_and_cap_both_bite(con):
    d = con.execute(_oracle("token_budget_allocator")).fetchdf()
    assert abs(d.target_frac.sum() - 1.0) < 1e-9
    assert ((d.sample_rate > 0) & (d.sample_rate <= 1)).all()
    # non-degenerate mixture: weights vary, some sources hit the rate cap
    # (cannot oversample) while others are budget-limited below 1
    assert d.target_frac.nunique() > 1
    assert (d.sample_rate == 1.0).any() and (d.sample_rate < 1.0).any()
    # expected yield never exceeds the inventory, and equals rate×inventory
    assert (d.expected_tokens <= d.src_tokens + 1e-6).all()
    assert (abs(d.expected_tokens - d.sample_rate * d.src_tokens) < 1e-6).all()


def test_pipeline_stages_each_do_work(con):
    """Every curation stage must discard something on this corpus: the
    final packed set is smaller than the raw corpus, and smaller than the
    post-dedup set (quota bites)."""
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    out = con.execute(_oracle("training_data_pipeline")).fetchdf()
    assert 0 < len(out) < n_docs
    from chilekids_etl_pipeline_spark.plans.llmdata3 import _pipeline_dedup_sql

    n_dedup = len(con.execute(_pipeline_dedup_sql("duckdb")).fetchdf())
    assert n_dedup < n_docs  # quality filter + dedup dropped something
    assert len(out) <= n_dedup


def test_containment_finds_planted_prefixes(con):
    """Every planted prefix twin (id + 200000) with enough filtered
    shingles must pair with its source at containment 1.0, and the
    detector must not fire on everything."""
    d = con.execute(_oracle("minhash_containment")).fetchdf()
    planted = d[(d.doc_b - d.doc_a) == 200000]
    assert len(planted) > 0
    assert (planted.containment >= 0.999).all()
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(d) < n_docs  # not a fire-on-everything degenerate


def test_dup_cluster_histogram_shape(con):
    """Planted copies must produce exactly the size-1/2/3 clusters the
    fixture implies, and removable counts must reconcile."""
    d = con.execute(_oracle("exact_dup_clusters")).fetchdf().set_index("cluster_size")
    assert set(d.index) == {1, 2, 3}
    assert (d.n_removable == (d.index - 1) * d.n_clusters).all()
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    # every doc lands in exactly one cluster (incl. planted +300k/+600k)
    assert d.n_docs.sum() > n_docs


def test_audio_chunks_stay_in_bounds(con):
    d = con.execute(_oracle("audio_chunk_plan")).fetchdf()
    assert (d.start_sample < d.n_samples).all()
    assert (d.end_sample <= d.n_samples).all()
    assert (d.end_sample > d.start_sample).all()
    assert d.n_chunks.max() > 1  # the explode actually explodes
    # chunk_idx is dense 0..n_chunks-1 per doc
    g = d.groupby("doc_id").agg(n=("chunk_idx", "size"), mx=("chunk_idx", "max"))
    assert (g.n == g.mx + 1).all()


def test_dq_expectations_detect_and_pass(con):
    """The deliberately-failing date-window check must report violations;
    the structural checks (PK, RI) must pass on the clean synthetic data
    — i.e. the checker can both fail and pass."""
    d = con.execute(_oracle("dq_expectations")).fetchdf().set_index("check_name")
    assert not d.loc["orders_date_before_2001", "passed"]
    assert d.loc["orders_date_before_2001", "n_violations"] > 0
    assert d.loc["orders_pk_unique", "passed"]
    assert d.loc["orders_custkey_references_customer", "passed"]
    assert d.loc["lineitem_orderkey_references_orders", "passed"]


def test_rfm_scores_and_segments_carry_signal(con):
    d = con.execute(_oracle("rfm_segmentation")).fetchdf()
    for c in ("r_score", "f_score", "m_score"):
        assert d[c].between(1, 4).all()
        assert d[c].nunique() > 1, f"degenerate {c}"
    assert d.segment.nunique() >= 3


def test_basket_lift_spreads_around_one(con):
    """Independent brands hover near lift 1; the probe pins that the
    statistic is computed (spread exists) and uses the right scale."""
    d = con.execute(_oracle("market_basket_pairs")).fetchdf()
    assert (d.n_cooc >= 2).all()
    assert 0.2 < d.lift.median() < 5
    assert d.lift.max() > d.lift.min()


def test_backlog_never_negative_and_returns_to_zero(con):
    d = con.execute(_oracle("order_backlog_daily")).fetchdf().sort_values("d")
    assert (d.open_orders >= 0).all()
    assert d.open_orders.iloc[-1] == 0  # every order eventually ships
    assert d.open_orders.max() > 10  # intervals genuinely overlap


def test_drift_js_in_valid_range(con):
    d = con.execute(_oracle("corpus_drift_js")).fetchdf().iloc[0]
    import math

    assert 0 <= d.js_divergence <= math.log(2) + 1e-9
    assert 0 < d.vocab_shared <= min(d.vocab_early, d.vocab_late)


def test_cdc_apply_deletes_and_updates_bite(con):
    """Every 13th key must be gone, every surviving 7th-key row must
    carry the updated price and version 2."""
    d = con.execute(_oracle("cdc_apply")).fetchdf()
    assert not (d.key % 13 == 0).any()
    upd = d[d.key % 7 == 0]
    assert len(upd) > 0
    assert (upd.last_op == "U").all() and (upd.version == 2).all()
    ins = d[(d.key % 7 != 0)]
    assert (ins.last_op == "I").all() and (ins.version == 1).all()


def test_snapshot_diff_finds_planted_changes_only(con):
    d = con.execute(_oracle("table_snapshot_diff")).fetchdf()
    by = d.groupby("change_type").size()
    assert set(by.index) == {"added", "removed", "changed"}
    ch = d[d.change_type == "changed"]
    assert (abs((ch.new_acctbal - ch.old_acctbal) - 100.0) < 1e-6).all()
    assert (d[d.change_type == "added"].key >= 500000).all()
    assert (d[d.change_type == "removed"].key % 17 == 0).all()


def test_mad_profile_flags_minority(con):
    d = con.execute(_oracle("anomaly_mad_robust")).fetchdf()
    assert (d.mad > 0).all()
    assert (d.flag_frac > 0).any()  # detector fires somewhere
    assert (d.flag_frac < 0.15).all()  # ... but on a minority


def test_hll_estimate_within_sketch_error(con):
    """256 registers -> theoretical RSE ~1.04/sqrt(256) = 6.5%; allow
    3 sigma. Also: registers never exceed m and the estimate is
    positive."""
    d = con.execute(_oracle("hll_distinct_portable")).fetchdf()
    assert (d.n_present <= 256).all()
    assert (d.hll_estimate > 0).all()
    assert (d.rel_error < 0.20).all()


def test_bm25_ranks_term_rich_docs(con):
    """BM25 must be positive for matching docs, increase with term hits,
    and not match the whole corpus (query-term filter does real work)."""
    d = con.execute(_oracle("bm25_score")).fetchdf()
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(d) <= n_docs
    assert (d.bm25 > 0).all()
    assert d.n_match_terms.between(1, 3).all()
    # docs matching all 3 query terms outscore single-term docs on average
    assert (
        d[d.n_match_terms == 3].bm25.mean() > d[d.n_match_terms == 1].bm25.mean()
    )


def test_inverted_index_postings_sorted_and_capped(con):
    d = con.execute(_oracle("inverted_index_build")).fetchdf()
    assert (d.df >= 100).all()
    for row in d.itertuples():
        ids = [int(x) for x in row.posting_head.split(",")]
        assert ids == sorted(ids)
        assert len(ids) <= 10


def test_mom_growth_derivative_reconciles(con):
    d = con.execute(_oracle("orders_mom_growth")).fetchdf().sort_values("month")
    assert d.mom_growth.iloc[0] != d.mom_growth.iloc[0]  # first row NULL/NaN
    got = d.revenue.iloc[1:].values / d.prev_revenue.iloc[1:].values - 1
    assert (abs(got - d.mom_growth.iloc[1:].values) < 1e-9).all()
    assert d.mom_growth.iloc[1:].abs().max() > 0  # revenue actually moves


def test_churn_flag_consistent_with_recency(con):
    d = con.execute(_oracle("customer_churn_flag")).fetchdf()
    assert (d.churned == (d.days_since_last > 365)).all()
    assert 0 < d.churned.mean() < 1  # both classes present
    assert (d.tenure_days >= 0).all()


def test_cms_one_sided_and_tight_on_heads(con):
    d = con.execute(_oracle("heavy_hitters_cms")).fetchdf()
    assert len(d) == 20
    assert (d.overcount >= 0).all()  # CMS never underestimates
    assert (d.cms_estimate == d.true_count + d.overcount).all()
    # the heaviest terms should not be swamped by collision noise
    head = d.sort_values("true_count", ascending=False).head(5)
    assert (head.overcount < head.true_count).all(), head


def test_dup_matrix_has_planted_cross_and_self_pairs(con):
    d = con.execute(_oracle("cross_source_dup_matrix")).fetchdf()
    cross = d[d.source_a != d.source_b]
    diag = d[d.source_a == d.source_b]
    assert len(cross) > 0 and cross.n_dup_groups.sum() > 0
    assert len(diag) > 0 and diag.n_dup_groups.sum() > 0


def test_kmeans_partitions_all_vectors(con):
    d = con.execute(_oracle("kmeans_lloyd")).fetchdf()
    n_vecs = con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    assert len(d) == 8
    assert (d.n_vecs > 0).all(), "empty cluster from deterministic seed"
    assert d.n_vecs.sum() == n_vecs
    assert (d.inertia > 0).all()


def test_ocr_score_varies_and_clean_corpus_not_flagged(con):
    d = con.execute(_oracle("ocr_artifact_score")).fetchdf()
    assert d.suspect.mean() < 0.5, "clean synthetic corpus mostly flagged"
    assert d.ocr_score.max() > d.ocr_score.min()


def test_twap_weighting_actually_bites(con):
    d = con.execute(_oracle("time_weighted_avg")).fetchdf()
    assert (d.span_us > 0).all()
    assert (d.twap - d.plain_avg).abs().max() > 1e-9, (
        "time weighting indistinguishable from plain average"
    )


def test_gap_fill_fills_every_gap(con):
    d = con.execute(_oracle("gap_fill_forward")).fetchdf()
    assert d.is_gap.any(), "no gaps generated — grid degenerate"
    assert (~d.is_gap).any()
    # first grid hour per user is an observed hour, so carry-forward
    # leaves no unfilled row
    assert d.v_filled.notna().all()


def test_pit_join_assigns_exactly_one_version(con):
    d = con.execute(_oracle("scd2_point_in_time")).fetchdf()
    assert d.event_id.is_unique, "validity intervals overlap"
    assert (d.ts >= d.valid_from).all()


def test_skew_profile_orderings(con):
    d = con.execute(_oracle("join_skew_profile")).fetchdf()
    assert len(d) == 1
    r = d.iloc[0]
    assert r.max_per_key >= r.p99 >= r.p90 >= r.p50 > 0
    assert 0 < r.top1_share <= 1
    assert r.skew_factor >= 1


def test_substring_dedup_finds_planted_slices(con):
    d = con.execute(_oracle("exact_substring_dedup")).fetchdf()
    planted = d[d.doc_b == d.doc_a + 500000]
    assert len(planted) > 0, "no planted 30-word slice detected"
    assert (d.span_words >= 17).all()
    assert (d.n_shared_grams >= d.max_run).all()


def test_norm_qc_catches_planted_zero_vectors(con):
    d = con.execute(_oracle("embedding_norm_qc")).fetchdf()
    n_planted = con.execute(
        "SELECT count(*) FROM embeddings WHERE vec_id % 97 = 0"
    ).fetchone()[0]
    assert d.n_zero_vecs.sum() == n_planted
    assert (d.min_dims == 64).all() and (d.max_dims == 64).all()
    assert (d[d.n_zero_vecs == 0].min_norm > 0).all()


def test_dataset_card_covers_all_sources(con):
    d = con.execute(_oracle("dataset_card_stats")).fetchdf()
    n_sources = con.execute(
        "SELECT count(DISTINCT source) FROM documents"
    ).fetchone()[0]
    assert len(d) == n_sources
    assert (d.n_docs > 0).all() and (d.total_tokens > 0).all()
    assert ((d.mean_tokens >= d.min_tokens)
            & (d.mean_tokens <= d.max_tokens)).all()


def test_histogram_quantile_tight_and_monotone(con):
    d = con.execute(_oracle("histogram_quantile")).fetchdf().sort_values("q")
    assert (d.rel_err < 0.05).all(), d  # <=19% bin width -> few-% error
    assert d.est_value.is_monotonic_increasing
    assert d.exact_value.is_monotonic_increasing


def test_session_paths_ranked_and_wellformed(con):
    d = con.execute(_oracle("session_path_topk")).fetchdf()
    assert len(d) == 20
    assert d.n_sessions.is_monotonic_decreasing
    assert d.path.str.contains(">").all()


def test_linkage_finds_planted_typo_twins(con):
    d = con.execute(_oracle("record_linkage_blocked")).fetchdf()
    planted = d[d.id_b == d.id_a + 900000]
    assert len(planted) > 0, "no planted typo twin matched"
    assert (planted.edit_dist == 1).all()
    assert (d.edit_dist <= 2).all()


def test_lang_confusion_diagonal_dominates(con):
    d = con.execute(_oracle("lang_confusion_matrix")).fetchdf()
    diag = d[d.label_lang == d.pred_lang].n_docs.sum()
    assert diag / d.n_docs.sum() > 0.25  # beats 5-way chance


def test_categorical_mi_nonnegative_and_bounded(con):
    d = con.execute(_oracle("categorical_mi")).fetchdf()
    r = d.iloc[0]
    assert r.mi_nats >= -1e-9
    assert r.chi2 >= 0
    assert r.n_cells > 0


def test_rolling_hll_tracks_exact_within_sketch_error(con):
    d = con.execute(_oracle("rolling_distinct_hll")).fetchdf()
    assert len(d) >= 7
    assert (d.rel_err < 0.15).all(), d.rel_err.max()  # m=256 -> ~6.5% rse
    assert (d.exact_users > 0).all()


def test_triangle_stats_consistent(con):
    d = con.execute(_oracle("graph_triangle_stats")).fetchdf()
    r = d.iloc[0]
    assert r.n_nodes > 0 and r.n_edges > 0
    assert r.n_triangles >= 0
    assert r.n_wedges >= r.n_triangles * 3  # every triangle closes 3 wedges
    assert 0 <= r.global_clustering <= 1


def test_interleave_positions_unique_and_cycling(con):
    d = con.execute(_oracle("training_order_interleave")).fetchdf()
    assert d.global_pos.is_unique
    n_src = d.source.nunique()
    # consecutive occupied positions rotate sources: within the dense
    # head (all sources still active) position % n_src identifies source
    head = d[d.global_pos < n_src * 10].sort_values("global_pos")
    by_slot = head.groupby(head.global_pos % n_src).source.nunique()
    assert (by_slot == 1).all(), "interleave slots mix sources"


def test_pmi_collocations_positive_and_supported(con):
    d = con.execute(_oracle("cooccurrence_pmi")).fetchdf()
    assert len(d) == 50
    assert (d.c_ab >= 10).all()
    assert d.pmi.is_monotonic_decreasing
    assert d.pmi.max() > 0, "no positive association found"


def test_zipf_fit_flags_synthetic_text(con):
    """The synthetic corpus draws from a tiny near-uniform vocabulary —
    exactly the distribution the Zipf gate exists to FLAG (natural text
    has exponent ≈ 1 with high r²). The probe pins that the fit reports
    the non-natural shape rather than hallucinating Zipfian structure,
    and that the regression algebra is sane."""
    d = con.execute(_oracle("zipf_fit")).fetchdf()
    r = d.iloc[0]
    vocab = con.execute(
        "SELECT count(DISTINCT word) FROM (SELECT unnest(list_filter("
        "string_split(text, ' '), x -> x <> '')) AS word FROM documents) w"
    ).fetchone()[0]
    assert r.n_points == min(1000, vocab)
    assert 0 <= r.r2 <= 1
    # uniform vocab -> flat rank curve: far from natural text's (1, high-r2)
    assert r.zipf_exponent < 0.5 or r.r2 < 0.5, (
        "synthetic uniform corpus misread as Zipfian"
    )


def test_similarity_histogram_bimodal_with_planted_mode(con):
    d = con.execute(_oracle("similarity_histogram")).fetchdf()
    assert (d.n_pairs > 0).all()
    assert d.bucket.min() <= 1, "no low-similarity noise mass"
    assert d.bucket.max() >= 8, "planted near-dups missing from top bucket"


def test_feature_scaling_ranges(con):
    d = con.execute(_oracle("feature_scaling")).fetchdf()
    assert ((d.pct_rank >= 0) & (d.pct_rank <= 1)).all()
    assert ((d.min_max >= 0) & (d.min_max <= 1)).all()
    assert d.z_score.abs().max() > 1  # spread exists
    g = d.groupby("o_orderstatus").z_score.mean().abs()
    assert (g < 0.2).all()  # centered per group


def test_ivm_merge_equals_full_recompute(con):
    d = con.execute(_oracle("incremental_mart_merge")).fetchdf()
    assert len(d) > 0
    assert d.matches_full.all(), "delta merge diverged from full recompute"


def test_km_curve_monotone_from_one(con):
    d = con.execute(_oracle("survival_km_curve")).fetchdf().sort_values(
        "month_bucket"
    )
    assert (d.survival <= 1).all() and (d.survival > 0).all()
    assert d.survival.is_monotonic_decreasing
    assert d.survival.iloc[-1] < d.survival.iloc[0], "no churn events bit"
    assert d.n_at_risk.is_monotonic_decreasing


def test_ab_test_wellformed(con):
    d = con.execute(_oracle("ab_test_conversion")).fetchdf()
    r = d.iloc[0]
    assert r.n_control > 0 and r.n_treat > 0
    assert 0 <= r.rate_control <= 1 and 0 <= r.rate_treat <= 1
    assert abs(r.abs_lift - (r.rate_treat - r.rate_control)) < 1e-9


def test_ltv_accumulates(con):
    d = con.execute(_oracle("customer_ltv_cohort")).fetchdf()
    g = d.sort_values("months_since").groupby("cohort_month")
    assert all(s.cum_revenue.is_monotonic_increasing for _, s in g)
    assert (d.ltv_cents_per_customer > 0).all()


def test_seasonality_indices_average_to_one(con):
    d = con.execute(_oracle("orders_seasonality_dow")).fetchdf()
    assert len(d) == 7
    assert abs(d.revenue_index.mean() - 1) < 0.01
    assert abs(d.volume_index.mean() - 1) < 0.01


def test_span_plan_within_bounds_and_near_rate(con):
    d = con.execute(_oracle("span_corruption_plan")).fetchdf()
    assert (d.end_pos > d.start_pos).all()
    assert (d.n_masked <= 3).all() and (d.n_masked >= 1).all()
    # spans of one doc never overlap (starts spaced >= span length)
    g = d.sort_values(["doc_id", "span_idx"]).groupby("doc_id")
    for _, s in g:
        if len(s) > 1:
            assert (s.start_pos.values[1:] >= s.end_pos.values[:-1]).all()


def test_rouge_planted_summaries_score_high(con):
    d = con.execute(_oracle("rouge_overlap_eval")).fetchdf()
    # a verbatim slice of the reference must have recall bounded by
    # its length share but well above zero, and never exceed 1
    assert ((d.rouge1_recall > 0) & (d.rouge1_recall <= 1)).all()
    assert ((d.rouge2_recall >= 0) & (d.rouge2_recall <= 1)).all()
    assert (d.rouge1_recall >= d.rouge2_recall - 1e-9).mean() > 0.9


def test_dpo_pairs_have_positive_margin(con):
    d = con.execute(_oracle("dpo_pair_construction")).fetchdf()
    assert (d.margin > 0).all(), "chosen not strictly better than rejected"
    assert d.source.is_unique  # exactly one pair per group


def test_vocab_coverage_monotone(con):
    d = con.execute(_oracle("tokenizer_vocab_coverage")).fetchdf()
    r = d.iloc[0]
    assert (r.coverage_top10 <= r.coverage_top100
            <= r.coverage_top1000 <= r.coverage_top5000 <= 1)
    assert r.coverage_top10 > 0


def test_bloom_never_false_negative_and_fp_near_theory(con):
    import math

    d = con.execute(_oracle("bloom_prune_semijoin")).fetchdf()
    r = d.iloc[0]
    assert r.n_candidates >= r.n_true_members  # no false negatives, ever
    assert r.n_false_positives == r.n_candidates - r.n_true_members
    # k=3, m=16384: fp ~ (1 - e^(-k*n/m))^k; allow 2x slack
    theory = (1 - math.exp(-3 * r.n_filter_keys / 16384)) ** 3
    assert r.false_positive_rate < max(2 * theory, 0.02), (
        r.false_positive_rate, theory
    )


def test_psi_drift_sane(con):
    d = con.execute(_oracle("psi_feature_drift")).fetchdf()
    r = d.iloc[0]
    assert r.psi >= 0  # PSI is a sum of nonneg KL-style terms
    assert r.n_bins > 5
    assert r.max_bin_shift < 1


def test_entity_split_leaks_and_entity_split_does_not(con):
    d = con.execute(_oracle("entity_split_check")).fetchdf()
    r = d.iloc[0]
    assert r.leaky_users_entity_split == 0  # by construction
    assert r.leaky_users_event_split > 0.5 * r.n_users, (
        "event-level split should leak most active users"
    )


def test_item_similarity_symmetric_and_ranked(con):
    d = con.execute(_oracle("item_similarity_topk")).fetchdf()
    assert ((d.cosine > 0) & (d.cosine <= 1)).all()
    # result-set row order is engine-incidental — sort before checking
    # the per-item ranking property
    d = d.sort_values(["b1", "cosine"], ascending=[True, False])
    g = d.groupby("b1")
    assert (g.size() <= 5).all()
    # every kept neighbor must beat (or tie) the group's worst cosine of
    # the top-5 — i.e. the window kept the top of the distribution
    full = con.execute(
        "WITH baskets AS (SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b"
        " FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey) "
        "SELECT a.b AS b1, count(*) AS n FROM baskets a "
        "JOIN baskets x ON a.ok = x.ok AND a.b <> x.b GROUP BY a.b"
    ).fetchdf()
    assert set(d.b1) <= set(full.b1)


def test_reshard_theory(con):
    d = con.execute(_oracle("consistent_hash_reshard")).fetchdf()
    r = d.iloc[0]
    # theory: mod moves ~8/9 of keys, rendezvous ~1/9
    assert abs(r.moved_mod_frac - 8 / 9) < 0.05
    assert abs(r.moved_hrw_frac - 1 / 9) < 0.05


# --- round-5 batch: lakehouse + eval/curation operators ---------------------


def test_zorder_prunes_both_dims_lexical_prunes_one(con):
    d = con.execute(_oracle("zorder_layout")).fetchdf().set_index("layout")
    # lexical layouts prune their own dimension perfectly and the other
    # not at all; z-order prunes both to ~sqrt(n_files)
    assert d.loc["by_custkey"].files_hit_custkey_probe == 1
    assert (d.loc["by_custkey"].files_hit_date_probe
            >= d.loc["by_custkey"].n_files * 0.5)
    assert d.loc["by_date"].files_hit_date_probe == 1
    z = d.loc["zorder"]
    assert 1 <= z.files_hit_custkey_probe < z.n_files / 3
    assert 1 <= z.files_hit_date_probe < z.n_files / 3


def test_compaction_bins_fill_near_target(con):
    d = con.execute(_oracle("small_file_compaction_plan")).fetchdf()
    # every output file except possibly a source's last must reach the
    # target (greedy packing leaves no mid-stream underfull bins)
    last = d.groupby("source").out_file.transform("max")
    full = d[d.out_file != last]
    if len(full):
        assert (full.fill_ratio >= 1.0).all()
    # input ranges within a source must not overlap (order preserved)
    for _, g in d.groupby("source"):
        g = g.sort_values("out_file")
        assert (g.first_input.values[1:] > g.last_input.values[:-1]).all()


def test_merkle_root_folds_leaves(con):
    d = con.execute(_oracle("merkle_partition_checksum")).fetchdf()
    root = d[d.part == "ROOT"]
    leaves = d[d.part != "ROOT"]
    assert len(root) == 1
    assert int(root.n_rows.iloc[0]) == int(leaves.n_rows.sum())
    import functools

    folded = functools.reduce(lambda a, b: a ^ b, leaves.checksum.astype(int))
    assert int(root.checksum.iloc[0]) == folded
    # a checksum actually depends on content: leaves are not all equal
    assert leaves.checksum.nunique() > 1


def test_range_planner_quantiles_beat_equal_width(con):
    d = con.execute(_oracle("range_partition_planner")).fetchdf().set_index(
        "method"
    )
    q, e = d.loc["quantile_boundaries"], d.loc["equal_width"]
    assert q.skew_factor <= e.skew_factor
    assert q.skew_factor < 1.05  # quantile boundaries ~uniform
    assert q.n_buckets == 16


def test_ndv_profile_low_cardinality_near_exact(con):
    d = con.execute(_oracle("ndv_profile_error")).fetchdf().set_index("col")
    # linear counting makes tiny cardinalities near-exact; the sketch
    # stays within its ~6.5% design error at m=256 for the larger ones
    assert d.loc["o_orderstatus"].rel_error < 0.05
    assert d.loc["o_orderpriority"].rel_error < 0.05
    assert (d.rel_error < 0.15).all()


def test_pass_at_k_monotone_and_anchored(con):
    d = con.execute(_oracle("pass_at_k_eval")).fetchdf().set_index("k")
    # pass@k is monotone nondecreasing in k, and pass@1 equals the raw
    # per-problem success fraction (the estimator reduces to c/n at k=1)
    assert d.loc[1].mean_pass_at_k <= d.loc[5].mean_pass_at_k <= d.loc[10].mean_pass_at_k
    raw = con.execute(
        "SELECT sum(CASE WHEN substr(md5(cast(doc_id AS varchar)), 1, 1) "
        "IN ('0','1','2','3') THEN 1 ELSE 0 END) "
        "/ cast(count(*) AS double) FROM documents"
    ).fetchone()[0]
    assert abs(d.loc[1].mean_pass_at_k - raw) < 2e-6  # ppm flooring


def test_keyword_screen_counts_whole_words_only(con):
    sql = _oracle("safety_keyword_screen")
    d = con.execute(sql).fetchdf()
    assert d.n_flagged.sum() > 0  # the blocklist terms exist in-corpus
    # whole-word semantics: a corpus where the term appears only as a
    # substring must produce zero hits
    c2 = duckdb.connect()
    c2.execute(
        "CREATE VIEW documents AS SELECT 1 AS doc_id, "
        "'slowly crashing leaky faucet' AS text, 'src0' AS source"
    )
    d2 = c2.execute(sql).fetchdf()
    assert int(d2.total_hits.sum()) == 0


def test_lateness_drop_rate_decreases_with_watermark(con):
    d = (
        con.execute(_oracle("lateness_watermark_profile"))
        .fetchdf()
        .sort_values("watermark_min")
    )
    assert (d.drop_rate.diff().dropna() < 0).all()
    assert d.p50_delay_min.iloc[0] <= d.p95_delay_min.iloc[0] <= d.p99_delay_min.iloc[0]


def test_matryoshka_fidelity_improves_with_dim(con):
    d = (
        con.execute(_oracle("matryoshka_dim_fidelity"))
        .fetchdf()
        .sort_values("dim")
    )
    # full dimension must agree with itself perfectly, with zero regret
    full = d[d.dim == 64].iloc[0]
    assert full.top1_agreement_rate == 1.0
    assert full.regret_sum_micro == 0
    # regret is nonnegative (the true top-1 maximizes full cosine) and
    # the shortest prefix pays at least as much as the longest
    assert (d.regret_sum_micro >= 0).all()
    assert d[d.dim == 8].regret_sum_micro.iloc[0] >= d[d.dim == 32].regret_sum_micro.iloc[0]


def test_join_size_cms_is_one_sided_and_tight_enough(con):
    d = con.execute(_oracle("join_size_cms_estimate")).fetchdf().iloc[0]
    assert d.true_size > 0
    assert d.overcount >= 0  # CMS inner product never underestimates
    assert d.rel_error < 0.5  # d=4 x w=512 keeps collisions modest


def test_bpe_merges_compress_monotonically(con):
    d = con.execute(_oracle("bpe_merge_learn")).fetchdf().sort_values("round")
    # every merge strictly shrinks the corpus token count by its support
    # (each applied pair replaces two tokens with one)
    assert (d.corpus_tokens_after.diff().dropna() < 0).all()
    assert (d.pair_count > 0).all()
    # supports are non-increasing: the best pair of round r+1 existed in
    # round r (or was created by it, bounded by the merged pair's count)
    assert (d.pair_count.diff().dropna() <= 0).all()
    # merged tokens enter the type inventory; it never shrinks below the
    # character alphabet
    assert (d.token_types_after.diff().dropna() >= 0).all()


def test_markov_rows_are_distributions(con):
    d = con.execute(_oracle("event_markov_transitions")).fetchdf()
    sums = d.groupby("cur").p.sum()
    assert ((sums - 1.0).abs() < 1e-9).all()
    assert (d[d.rank_in_row == 1].groupby("cur").size() == 1).all()


def test_freshness_flags_are_monotone(con):
    d = con.execute(_oracle("data_freshness_sla")).fetchdf()
    # a feed inside the 1h bound is inside 6h and 24h too
    assert ((~d.within_1h) | d.within_6h).all()
    assert ((~d.within_6h) | d.within_24h).all()
    assert (d.lag_us >= 0).all() and (d.lag_us == 0).any()


def test_schema_drift_detects_planted_addition(con):
    d = con.execute(_oracle("schema_drift_keys")).fetchdf().set_index(
        "json_key"
    )
    assert d.loc["sess"].status == "added"
    assert d.loc["k"].status == "present"
    assert abs(d.loc["k"].rate_old - 1.0) < 1e-9
    assert 0.2 < d.loc["ver"].rate_new < 0.5  # ~1/3 of rows


def test_erasure_audit_leaks_nothing_and_removes_someone(con):
    d = con.execute(_oracle("gdpr_erasure_audit")).fetchdf()
    assert (d.n_leaked_rows == 0).all()
    assert d.n_rows_removed.sum() > 0
    assert (d.n_requests > 0).all()


def test_lsh_band_tuning_tradeoff_curve(con):
    d = con.execute(_oracle("lsh_band_tuning")).fetchdf().set_index("b")
    # more bands (fixed 12-hash budget) => lower threshold, higher recall
    assert d.s50.loc[12] < d.s50.loc[6] < d.s50.loc[2] < d.s50.loc[1]
    assert d.recall_at_05.loc[12] >= d.recall_at_05.loc[1]
    assert (d.recall_at_05 <= 1.0 + 1e-9).all()
    # the permissive extreme wastes the most verification work
    assert d.waste_frac.loc[12] == d.waste_frac.max()


def test_ccnet_buckets_are_thirds_and_ordered(con):
    d = con.execute(_oracle("ccnet_perplexity_buckets")).fetchdf()
    per_lang = d.groupby("lang")
    for lang, g in per_lang:
        g = g.set_index("bucket").sort_index()
        assert list(g.index) == [0, 1, 2], lang
        n = g.n_docs.sum()
        # thirds within one tie-block of exact
        assert abs(g.n_docs.loc[0] - n / 3) < n / 6, lang
        # head scores strictly better (lower) than tail scores
        assert g.score_hi_micro.loc[0] <= g.score_lo_micro.loc[2], lang


def test_code_classifier_flags_some_not_all(con):
    d = con.execute(_oracle("code_prose_classify")).fetchdf()
    assert 0 < d.is_code.sum() < len(d)
    flagged = d[d.is_code == 1]
    unflagged = d[d.is_code == 0]
    assert flagged.kw_density_micro.min() > unflagged.kw_density_micro.mean()


def test_best_of_n_margin_nonnegative_and_winner_in_group(con):
    d = con.execute(_oracle("best_of_n_select")).fetchdf()
    assert (d.margin_micro >= 0).all()
    assert (d.best_doc_id // 8 == d.group_id).all()
    assert (d.n_candidates <= 8).all()
    assert d.margin_micro.max() > 0  # at least one decisive group


def test_sft_mask_covers_doc_and_masks_minority(con):
    d = con.execute(_oracle("sft_mask_plan")).fetchdf()
    assert (d.prompt_tokens + d.response_tokens == d.n_tokens).all()
    assert (d.mask_frac_micro <= 1000000).all()
    # long docs mask ~20%
    long = d[d.n_tokens >= 50]
    assert not long.empty
    assert (abs(long.mask_frac_micro - 200000) <= 20000).all()


def test_cer_detects_truncation_but_stays_small(con):
    d = con.execute(_oracle("cer_pair_eval")).fetchdf()
    # every hypothesis lost its 5-word tail => nonzero edit distance
    assert (d.edit_dist > 0).all()
    # but the aligned window bounds CER well below 100%
    assert (d.cer_micro < 1000000).all()
    assert (d.ref_len <= 120).all() and (d.hyp_len <= 120).all()


def test_event_gap_histogram_shares_and_means(con):
    d = con.execute(_oracle("event_gap_histogram")).fetchdf()
    per_type = d.groupby("event_type").share_micro.sum()
    # integer-floored shares sum to ~1e6 per type
    assert ((per_type > 999990) & (per_type <= 1000000)).all()
    bounds = [0, 1_000_000, 10_000_000, 100_000_000, 1_000_000_000,
              10_000_000_000]
    for _, row in d.iterrows():
        b = int(row.decade_bucket)
        assert row.mean_gap_us >= bounds[b]
        if b < 5:
            assert row.mean_gap_us < bounds[b + 1]


def test_ewma_smooths_and_tracks(con):
    d = con.execute(_oracle("ewma_daily_revenue")).fetchdf().sort_values(
        "epoch_day"
    )
    # full 11-day support (weight_sum = 2^11 - 1) must hold for exactly
    # the days whose entire lookback window exists in the sparse series
    days = set(d.epoch_day)
    expect_full = {
        day for day in days if all(day - k in days for k in range(11))
    }
    full = d[d.weight_sum == 2047]
    assert set(full.epoch_day) == expect_full
    basis = full if len(full) >= 30 else d
    # smoothing shrinks variance vs the raw series
    assert basis.ewma_cents.std() < basis.rev_cents.std()
    # the smoothed value is a weighted mean of present days, so it stays
    # inside the raw range on every row (full support or not)
    assert d.ewma_cents.min() >= d.rev_cents.min() - 1
    assert d.ewma_cents.max() <= d.rev_cents.max() + 1


def test_topk_threshold_matches_global_sort(con):
    d = con.execute(_oracle("revenue_topk_threshold")).fetchdf()
    naive = con.execute("""
        SELECT o_custkey,
               cast(sum(cast(round(o_totalprice * 100, 0) AS bigint))
                    AS bigint) AS rev_cents
        FROM orders GROUP BY o_custkey
        ORDER BY rev_cents DESC, o_custkey LIMIT 100
    """).fetchdf()
    assert list(d.sort_values("rk").o_custkey) == list(naive.o_custkey)


def test_topk_threshold_actually_prunes(con):
    """The msb-histogram threshold must admit a candidate slice that is
    k plus at most one bucket's worth — NOT the whole customer set (the
    r6 advisor caught min() degenerating to the lowest bucket's floor,
    which made phase 2 a full global sort)."""
    from chilekids_etl_pipeline_spark.plans.analytics11 import (
        _TOPK, _topk_sql,
    )

    sql = _topk_sql("duckdb")
    tail = f"SELECT rk, o_custkey, rev_cents\nFROM ranked WHERE rk <= {_TOPK}"
    assert tail in sql
    cand_sql = sql.replace(
        tail, "SELECT cast(count(*) AS bigint) AS n FROM candidates"
    )
    n_cand = con.execute(cand_sql).fetchone()[0]
    revs = [
        r[0]
        for r in con.execute(
            "SELECT cast(sum(cast(round(o_totalprice * 100, 0) AS bigint))"
            " AS bigint) FROM orders GROUP BY o_custkey"
        ).fetchall()
    ]
    # reference rule: floor of the LARGEST msb bucket whose from-the-top
    # cumulative count reaches k; candidates = rows at or above that floor
    floors = sorted({1 << (r.bit_length() - 1) for r in revs}, reverse=True)
    expected = 0
    for fl in floors:
        at_or_above = sum(1 for r in revs if r >= fl)
        if at_or_above >= min(_TOPK, len(revs)):
            expected = at_or_above
            break
    assert n_cand == expected
    # and the whole point: the slice is a PRUNED candidate set, not the
    # full customer table (safe: >= k when that many customers exist)
    assert n_cand >= min(_TOPK, len(revs))
    if len(revs) > 4 * _TOPK:
        assert n_cand < len(revs) // 2


def test_bloom_fpp_tracks_theory_and_shrinks_with_m(con):
    d = con.execute(_oracle("bloom_fpp_calibration")).fetchdf().sort_values(
        "m_bits"
    )
    # more bits => fewer false positives (weakly, both measured+theory)
    assert d.fpp_measured_micro.is_monotonic_decreasing
    assert d.fpp_theory.is_monotonic_decreasing
    # never a false negative: candidates cover all true members
    assert (d.n_candidates >= d.n_true_members).all()
    # measured within a small factor of theory where theory is sizeable
    big = d[d.fpp_theory > 0.01]
    for _, r in big.iterrows():
        measured = r.fpp_measured_micro / 1e6
        assert 0.3 * r.fpp_theory < measured < 3 * r.fpp_theory + 1e-4


# --- round-7 batch ---------------------------------------------------------


def test_fim_spans_partition_the_document(con):
    d = con.execute(_oracle("fim_split_plan")).fetchdf()
    # the three spans always reassemble the doc
    assert (
        d.prefix_len + d.middle_len + d.suffix_len == d.total_len
    ).all()
    assert (d.prefix_len >= 0).all() and (d.middle_len >= 0).all()
    # ~50% transformed, both orderings present among transformed docs
    rate = d.fim_applied.mean()
    assert 0.35 < rate < 0.65
    assert set(d[d.fim_applied]["mode"]) == {"psm", "spm"}
    # untransformed docs are pure causal: whole doc is "prefix"
    plain = d[~d.fim_applied]
    assert (plain.prefix_len == plain.total_len).all()
    assert (plain["mode"] == "none").all()


def test_chat_validation_flags_planted_violations(con):
    d = con.execute(_oracle("chat_turn_validate")).fetchdf()
    # complete conversations (all 4 turns survived) are trainable
    full = d[d.n_turns == 4]
    assert len(full) > 0
    assert full.starts_user.all() and full.ends_assistant.all()
    assert (full.n_role_repeats == 0).all()
    # every 7th doc was dropped => some conversations are short, and a
    # dropped middle turn creates a same-role adjacency somewhere
    assert (d.n_turns < 4).any()
    assert (d.n_role_repeats > 0).any()
    assert (d.n_turns_in_budget <= d.n_turns).all()


def test_epoch_allocation_respects_budget_and_decay(con):
    from chilekids_etl_pipeline_spark.plans.llmdata12 import (
        _BUDGET_NUM, _EPOCH_MAX,
    )

    d = con.execute(_oracle("epoch_repeat_plan")).fetchdf()
    budget = _BUDGET_NUM * d.unique_tokens.sum()
    assert d.tokens_used.sum() <= budget
    assert (d.epochs >= 1).all() and (d.epochs <= _EPOCH_MAX).all()
    # tightness: the allocation isn't leaving a whole source-epoch of
    # headroom for the smallest source
    assert d.tokens_used.sum() + d.unique_tokens.min() > budget * 0.9
    # value accounting: epochs e of source u is worth sum_k u >> k
    for _, r in d.iterrows():
        expect = sum(int(r.unique_tokens) >> k for k in range(int(r.epochs)))
        assert r.effective_value == expect
    assert (d.tokens_used == d.epochs * d.unique_tokens).all()


def test_pca_power_step_is_unit_normalized_and_nontrivial(con):
    d = con.execute(_oracle("embedding_pca_power")).fetchdf()
    assert len(d) == 64
    sq = (d.component ** 2).sum()
    assert 0.999 < sq < 1.001
    assert (d.s_micro != 0).any()
    assert d.component.abs().max() <= 1.0


def test_dhash_finds_planted_copies_and_only_near(con):
    d = con.execute(_oracle("image_dhash_dedup")).fetchdf()
    assert (d.hamming <= 3).all()
    # every planted copy pair (id, id+100000) collides at distance 0
    imgs = con.execute(
        "SELECT doc_id FROM documents WHERE doc_id % 3 = 0 AND doc_id % 10 = 0"
    ).fetchdf()
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in d.itertuples()}
    for i in imgs.doc_id:
        assert pairs.get((i, i + 100000)) == 0, i


def test_decile_lift_gains_accumulate_to_one(con):
    d = con.execute(_oracle("decile_lift_table")).fetchdf().sort_values(
        "decile"
    )
    assert list(d.decile) == list(range(10))
    assert d.cum_gain_micro.is_monotonic_increasing
    assert d.cum_gain_micro.iloc[-1] == 1_000_000
    n_cust = con.execute(
        "SELECT count(DISTINCT o_custkey) FROM orders"
    ).fetchone()[0]
    assert d.n_customers.sum() == n_cust
    # spend boundaries are decreasing: decile 0 is the top spenders
    assert d.spend_lo_cents.iloc[0] >= d.spend_hi_cents.iloc[-1]


def test_zone_map_pruning_brackets_the_domain(con):
    d = con.execute(_oracle("partition_prune_estimate")).fetchdf()
    by_pred = {(r.lo, r.hi): r for r in d.itertuples()}
    # (60, 99) is outside l_quantity's 1..50 domain: everything prunes
    out = by_pred[(60, 99)]
    assert out.n_pruned == out.n_partitions and out.scan_frac_micro == 0
    # (1, 10) overlaps every month's zone: nothing prunes
    full = by_pred[(1, 10)]
    assert full.n_pruned == 0 and full.scan_frac_micro == 1_000_000
    assert (d.rows_scanned <= d.rows_total).all()
    assert d.rows_total.nunique() == 1


def test_abc_classes_follow_pareto_cuts(con):
    d = con.execute(_oracle("abc_pareto_class")).fetchdf()
    by = {r.abc_class: r for r in d.itertuples()}
    assert set(by) == {"A", "B", "C"}
    assert by["A"].rev_cents > by["B"].rev_cents > by["C"].rev_cents
    total_share = d.rev_share_micro.sum()
    assert 999_990 <= total_share <= 1_000_000
    # the cuts: A holds >= 80% of revenue minus one value-bucket of slack
    assert by["A"].rev_share_micro >= 700_000
    assert by["C"].rev_share_micro <= 80_000


def test_grpo_advantages_standardize_within_group(con):
    d = con.execute(_oracle("grpo_advantage_plan")).fetchdf()
    # each group's advantages sum to ~0 (floor-rounding slack: 1 micro
    # per sample), and real spread exists somewhere
    sums = d.groupby("prompt_id").adv_micro.sum()
    ns = d.groupby("prompt_id").doc_id.count()
    assert (sums.abs() <= ns).all()
    assert d.adv_micro.abs().max() > 500_000
    # clip flag is literally |adv| > 2 sigma
    assert (d.clipped == (d.adv_micro.abs() > 2_000_000)).all()
    # population-standardized: per-group second moment ~ n (micros^2)
    g = d.groupby("prompt_id")
    ss = (d.adv_micro.astype(float) / 1e6) ** 2
    ratio = ss.groupby(d.prompt_id).sum() / g.doc_id.count()
    spread = ratio[g.doc_id.count() > 1]
    assert 0.9 < spread.mean() < 1.1


def test_weighted_sample_is_length_biased(con):
    d = con.execute(_oracle("weighted_sample_topk")).fetchdf()
    assert len(d) == 100
    assert sorted(d.sample_rank) == list(range(1, 101))
    assert d.doc_id.is_unique
    corpus_mean = con.execute(
        "SELECT avg(n_chars) FROM documents"
    ).fetchone()[0]
    # selection proportional to length -> the sample's mean weight beats
    # the corpus mean by a clear margin
    assert d.w.mean() > corpus_mean * 1.05


def test_doremi_step_shifts_weight_toward_excess_loss(con):
    d = con.execute(_oracle("doremi_reweight_step")).fetchdf()
    assert len(d) == d.source.nunique()
    # normalized within floor slack
    assert 1_000_000 - len(d) <= d.weight_after_micro.sum() <= 1_000_000
    assert (d.loc[d.excess_micro == 0, "factor_micro"] == 1_000_000).all()
    # multiplicative weights: the highest-excess domain gains the most
    # relative to its token share
    ratio = d.weight_after_micro / d.weight_before_micro.clip(lower=1)
    assert ratio.idxmax() == d.excess_micro.idxmax()
    assert d.excess_micro.max() > 0  # the synthetic losses do separate


def test_theta_sketch_estimates_track_exact_overlap(con):
    d = con.execute(_oracle("theta_sketch_set_ops")).fetchdf()
    n_types = con.execute(
        "SELECT count(DISTINCT event_type) FROM events"
    ).fetchone()[0]
    assert len(d) == n_types * (n_types - 1) // 2
    assert (d.est_union_micro >= d.est_inter_micro).all()
    assert d.jaccard_micro.between(0, 1_000_000).all()
    exact = con.execute("""
        WITH ud AS (
            SELECT DISTINCT event_type,
                   user_id || ':' || cast(cast(ts AS date) AS varchar)
                       AS uday
            FROM events
        )
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS inter
        FROM ud a JOIN ud b
          ON b.uday = a.uday AND a.event_type < b.event_type
        GROUP BY 1, 2
    """).fetchdf()
    m = d.merge(exact, on=["type_a", "type_b"], how="left").fillna(
        {"inter": 0}
    )
    assert len(m) == len(d)
    # the sketched segments are NOT identical sets: jaccard discriminates
    assert d.jaccard_micro.min() < 900_000
    # k=64 KMV: relative error ~ 1/sqrt(k); assert the union estimate
    # tracks exact union cardinality within a 2x band on every pair
    exact_union = con.execute("""
        WITH ud AS (
            SELECT DISTINCT event_type,
                   user_id || ':' || cast(cast(ts AS date) AS varchar)
                       AS uday
            FROM events
        ), t AS (SELECT DISTINCT event_type, 1 AS one FROM ud)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(DISTINCT u.uday) AS uni
        FROM t a JOIN t b ON a.one = b.one AND a.event_type < b.event_type
        JOIN ud u ON u.event_type IN (a.event_type, b.event_type)
        GROUP BY 1, 2
    """).fetchdf()
    mu = d.merge(exact_union, on=["type_a", "type_b"])
    assert len(mu) == len(d)
    est_u = mu.est_union_micro / 1e6
    assert ((est_u >= mu.uni * 0.5) & (est_u <= mu.uni * 2.0)).all()


def test_benford_flags_uniform_prices(con):
    d = con.execute(_oracle("benford_digit_screen")).fetchdf()
    # 9 digit rows per segment, obs partitions the segment
    assert (d.groupby("segment").digit.count() == 9).all()
    per_seg = d.groupby("segment").agg(
        n=("n_orders", "max"), tot=("obs", "sum")
    )
    assert (per_seg.n == per_seg.tot).all()
    # TPC-H prices are uniform, not logarithmic: every segment violates
    assert d.benford_violation.all()
    assert (d.chi2_micro > 15_507_000).all()
    # the generated prices are far from logarithmic: the statistic is
    # not borderline but decisive (>= 5x the critical value)
    assert (d.chi2_micro > 5 * 15_507_000).all()


def test_corpus_dedup_gate_drops_exactly_the_corpus(con):
    d = con.execute(_oracle("streaming_corpus_dedup_replay")).fetchdf()
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert 0 < len(d) < n_docs
    corpus_ids = {
        r[0] for r in con.execute(
            "SELECT doc_id FROM documents WHERE doc_id % 3 = 0"
        ).fetchall()
    }
    assert not (set(d.doc_id) & corpus_ids)


def test_quality_gate_audit_has_mixed_outcomes(con):
    d = con.execute(_oracle("streaming_quality_gate_replay")).fetchdf()
    assert set(d.check_name) == {"value_cap", "known_type",
                                 "value_positive"}
    by = {r.check_name: r for r in d.itertuples()}
    # the type list genuinely quarantines, the positivity check passes
    assert by["known_type"].n_violations > 0
    assert by["value_positive"].n_violations == 0 and bool(
        by["value_positive"].passed
    )
    assert d.n_checked.nunique() == 1
    # routing identity: good + quarantined == checked
    assert (d.n_good + d.n_quarantined == d.n_checked).all()


def test_kneser_ney_scores_are_positive_and_spread(con):
    d = con.execute(_oracle("kneser_ney_bigram")).fetchdf()
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert len(d) == n_docs
    assert (d.n_bigrams >= 1).all()
    # -ln P of a valid probability is positive; vocab ~30 => ln < ~ln(30*2)
    assert (d.avg_neg_logp_micro > 0).all()
    assert d.avg_neg_logp_micro.max() < 20_000_000
    assert d.avg_neg_logp_micro.nunique() > 10  # real per-doc signal
    # arithmetic identity: avg = sum DIV n
    assert (d.avg_neg_logp_micro
            == d.sum_neg_logp_micro // d.n_bigrams).all()


def test_ht_estimates_debias_the_weighted_sample(con):
    d = con.execute(_oracle("importance_weighted_stats")).fetchdf()
    # the Poisson draw landed near its expected size
    assert 0.5 * 200 <= d.n_sampled.sum() <= 2 * 200
    # per-source HT estimates track truth (k/|sources| draws per source,
    # rel error ~ 1/sqrt(n) — generous 60% band, zero would mean broken)
    assert (d.tok_rel_err_micro < 600_000).all()
    # aggregate estimate is tight
    tot_est, tot_true = d.est_tokens.sum(), d.true_tokens.sum()
    assert abs(tot_est - tot_true) < 0.25 * tot_true
    assert (d.est_docs > 0).all()


def test_conformal_coverage_tracks_target(con):
    d = con.execute(
        _oracle("conformal_threshold_calibration")
    ).fetchdf().sort_values("alpha_pct")
    assert list(d.alpha_pct) == [5, 10, 20]
    # threshold and coverage shrink as alpha grows
    assert d.q_hat_cents.is_monotonic_decreasing
    assert d.coverage_micro.is_monotonic_decreasing
    # measured holdout coverage sits near 1-alpha (finite-sample band)
    assert ((d.coverage_micro - d.target_micro).abs() <= 90_000).all()
    assert (d.k_from_top >= 1).all()


def test_isotropy_probe_detects_structure(con):
    d = con.execute(_oracle("embedding_isotropy_probe")).fetchdf()
    assert len(d) == 64
    assert d.anisotropy_micro.nunique() == 1  # corpus-level scalar
    a = d.anisotropy_micro.iloc[0]
    assert 0 <= a < 1_000_000
    # energy shares partition the total (floor slack: 1 micro per dim)
    assert 1_000_000 - 64 <= d.energy_share_micro.sum() <= 1_000_000
    assert d.top_dim_share_micro.iloc[0] == d.energy_share_micro.max()
    # 64 dims: a uniform cloud would put ~15625 micros per dim; the probe
    # is useful iff shares actually vary
    assert d.energy_share_micro.max() > d.energy_share_micro.min()


def test_kfold_assignment_is_balanced_per_stratum(con):
    d = con.execute(_oracle("stratified_kfold_assign")).fetchdf()
    assert set(d.fold) == {0, 1, 2, 3, 4}
    assert (d.stratum_imbalance <= 1).all()
    per_lang = d.groupby("lang").fold.count()
    assert (per_lang == 5).all()
    n_docs = con.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert d.n_docs.sum() == n_docs


def test_k_anonymity_risk_grows_with_k(con):
    d = con.execute(_oracle("k_anonymity_check")).fetchdf().sort_values("k")
    assert list(d.k) == [2, 5, 10]
    assert d.rows_at_risk.is_monotonic_increasing
    assert d.risk_frac_micro.between(0, 1_000_000).all()
    # the fine QI tuple on a small table is NOT k-anonymous at k=10 —
    # the screen exists to say so
    assert not bool(d[d.k == 10].k_anonymous.iloc[0])
    assert (d.n_rows == d.n_rows.iloc[0]).all()


# ---------------------------------------------------------------------------
# batch 16


def test_ngram_topk_df_shares_and_df_bounds(con):
    d = con.execute(_oracle("ngram_topk_df")).fetchdf()
    assert len(d) == 20
    # ordered by occurrence count; shares follow the same order
    assert d.n_occ.is_monotonic_decreasing
    assert d.occ_share_micro.is_monotonic_decreasing
    # doc frequency can never exceed occurrences, and a top-20 corpus
    # trigram must appear in more than one document
    assert (d.n_docs <= d.n_occ).all()
    assert (d.n_docs > 1).all()
    assert (d.gram.str.count(" ") == 2).all()


def test_negative_sampling_ranges_partition_and_flatten(con):
    d = con.execute(_oracle("negative_sampling_freq")).fetchdf()
    # cumulative ranges tile [0, total) half-open: first lo is the empty
    # frame (NULL), every hi equals the next row's lo, widths = weights
    assert d.cum_lo.isna().iloc[0] and d.cum_lo.isna().sum() == 1
    lo = d.cum_lo.fillna(0).to_numpy()
    hi = d.cum_hi.to_numpy()
    assert (hi - lo == d.w_micro.to_numpy()).all()
    assert (lo[1:] == hi[:-1]).all()
    # ^0.75 flattens the head: the top token's smoothed share must sit
    # strictly below its raw frequency share
    raw_share = d.n.iloc[0] / d.n.sum()
    assert d.p_micro.iloc[0] / 1_000_000 < raw_share


def test_hard_negatives_respect_band_and_labels(con):
    d = con.execute(_oracle("hard_negative_mining")).fetchdf()
    assert len(d) > 0
    assert d.cosine.between(0.10, 0.45, inclusive="left").all()
    assert (d["rank"] <= 5).all()
    lab = con.execute(
        "SELECT vec_id, label FROM embeddings"
    ).fetchdf().set_index("vec_id").label
    assert (
        lab.loc[d.query_id].to_numpy() != lab.loc[d.neighbor_id].to_numpy()
    ).all()
    # per query: ranks are dense from 1 and cosine non-increasing in rank
    for _, g in d.groupby("query_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert g.cosine.is_monotonic_decreasing or g.cosine.nunique() < len(g)


def test_burst_zscore_orders_and_flags(con):
    d = con.execute(_oracle("event_burst_zscore")).fetchdf()
    assert len(d) == 20
    assert d.z_micro.is_monotonic_decreasing
    assert (d.mean_micro > 0).all()
    assert ((d.z_micro >= 3_000_000) == (d.is_burst == 1)).all()


def test_referential_integrity_consistent_star(con):
    d = con.execute(_oracle("referential_integrity_audit")).fetchdf()
    assert len(d) == 8
    # the synthetic star is referentially consistent — every edge clean
    assert (d.orphan_rows == 0).all()
    assert (d.orphan_rate_micro == 0).all()
    assert (d.child_keys <= d.child_rows).all()


def test_referential_integrity_detects_planted_orphan():
    import duckdb as _duck

    c = _duck.connect()
    for p in glob.glob(f"{SF_SMALL}/*.parquet"):
        c.execute(
            f"CREATE VIEW {os.path.basename(p).removesuffix('.parquet')}_raw "
            f"AS SELECT * FROM '{p}'"
        )
    for t in ("lineitem", "orders", "customer", "supplier",
              "nation", "region", "part"):
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM {t}_raw")
    # one event from a user id no customer has
    c.execute(
        "CREATE VIEW events AS SELECT * FROM events_raw UNION ALL "
        "(SELECT event_id, ts, 999999999 AS user_id, event_type, value, "
        "props FROM events_raw LIMIT 1)"
    )
    d = c.execute(_oracle("referential_integrity_audit")).fetchdf()
    row = d[d.edge == "events.user_id->customer"].iloc[0]
    assert row.orphan_rows == 1 and row.orphan_rate_micro > 0


def test_winsorized_mean_sits_inside_cuts(con):
    d = con.execute(_oracle("winsorized_segment_stats")).fetchdf()
    assert len(d) == 5
    assert (d.lo_micro < d.hi_micro).all()
    assert (d.winsor_mean_micro >= d.lo_micro).all()
    assert (d.winsor_mean_micro <= d.hi_micro).all()
    # clamping moved every segment's mean (degenerate cuts would not)
    assert (d.winsor_mean_micro != d.raw_mean_micro).any()


def test_session_entropy_bounded_by_type_count(con):
    d = con.execute(_oracle("session_entropy")).fetchdf()
    n_types = con.execute(
        "SELECT count(DISTINCT event_type) FROM events"
    ).fetchone()[0]
    import math

    h_max = math.floor(1_000_000 * math.log(n_types))
    assert (d.max_h_micro <= h_max).all()
    assert (d.min_h_micro >= 0).all()
    n_users = con.execute(
        "SELECT count(DISTINCT user_id) FROM events"
    ).fetchone()[0]
    assert d.n_users.sum() == n_users
    n_events = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert d.events_covered.sum() == n_events


# ---------------------------------------------------------------------------
# batch 17


def test_dp_release_noise_is_laplace_like(con):
    d = con.execute(_oracle("dp_laplace_counts")).fetchdf()
    # one cell per observed (lang, source); released = true + noise
    assert (
        d.released_micro == d.true_n * 1_000_000 + d.noise_micro
    ).all()
    # Laplace(b=1): half the mass within b·ln2 of 0, long tails beyond;
    # deterministic hash-uniform must produce BOTH signs and a spread
    assert (d.noise_micro > 0).any() and (d.noise_micro < 0).any()
    med = d.abs_err_micro.median()
    assert 200_000 < med < 2_000_000  # median |noise| near ln2 ≈ 0.693
    assert d.abs_err_micro.max() > 1_500_000  # a tail draw exists


def test_l_diversity_monotone_and_consistent(con):
    d = con.execute(_oracle("l_diversity_check")).fetchdf().sort_values("l")
    assert list(d.l) == [2, 3, 5]
    assert d.classes_below.is_monotonic_increasing
    assert d.rows_exposed.is_monotonic_increasing
    assert (d.exposed_frac_micro.between(0, 1_000_000)).all()
    # 5 order priorities over big nation×segment classes: diverse at
    # l=2 but the min-l column must still be a real measurement
    assert (d.min_l >= 1).all()
    assert ((d.min_l >= d.l) == (d.l_diverse == 1)).all()


def test_theil_sen_bounded_pairs_and_sane_slope(con):
    d = con.execute(_oracle("theil_sen_trend")).fetchdf()
    assert len(d) == 1
    r = d.iloc[0]
    assert r.n_days <= 180
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    # both estimators exist and the gap column is their distance
    assert r.slope_gap_micro == abs(r.ts_slope_micro - r.ols_slope_micro)


def test_gini_bounded_and_nondegenerate(con):
    d = con.execute(_oracle("gini_revenue_concentration")).fetchdf()
    assert len(d) == 5
    assert d.gini_micro.between(0, 1_000_000).all()
    # revenue is never perfectly equal nor perfectly concentrated
    assert (d.gini_micro > 0).all() and (d.gini_micro < 900_000).all()


def test_entropy_rate_orderings(con):
    d = con.execute(_oracle("ngram_entropy_rate")).fetchdf()
    assert len(d) == 5
    # joint >= marginal, conditional >= 0 (floor slack: vocab-size micros)
    assert (d.h12_micro >= d.h1_micro).all()
    assert (d.cond_micro >= -int(d.bigram_types.max())).all()
    # unigram entropy below the uniform ceiling; conditioning reduces
    # per-token uncertainty vs the unigram rate on natural-ish text
    assert (d.h1_micro <= d.uniform_ceiling_micro).all()
    assert (d.cond_micro <= d.h1_micro + int(d.bigram_types.max())).all()


# ---------------------------------------------------------------------------
# batch 18


def test_elasticity_regression_is_complete(con):
    d = con.execute(_oracle("grouped_ols_elasticity")).fetchdf()
    assert len(d) >= 3
    assert (d.n > 30).all()
    # correlation is a bounded micro value and consistent in sign with
    # the slope (same numerator)
    assert d.corr_micro.between(-1_000_000, 1_000_000).all()
    same_sign = (d.slope_micro >= 0) == (d.corr_micro >= 0)
    assert same_sign.all()


def test_backtest_windows_and_errors(con):
    d = con.execute(_oracle("forecast_backtest_mape")).fetchdf()
    r = d.iloc[0]
    assert r.n_train <= 180 and r.n_test <= 30
    assert r.n_test >= 1 and r.n_train >= 30
    assert r.mape_micro >= 0
    assert r.worst_day_ape_micro >= r.mape_micro
    assert abs(r.bias_micro) <= r.mape_micro + 1


def test_zonemap_sorted_layout_dominates(con):
    d = con.execute(_oracle("zonemap_skip_rate")).fetchdf()
    assert len(d) >= 12
    assert d.skip_sorted_micro.between(0, 1_000_000).all()
    assert d.skip_natural_micro.between(0, 1_000_000).all()
    # sort-on-write is the whole point: the sorted layout must skip at
    # least as much as insertion order for EVERY monthly predicate,
    # and strictly more in aggregate
    assert (d.skip_sorted_micro >= d.skip_natural_micro).all()
    assert d.skip_sorted_micro.sum() > d.skip_natural_micro.sum()
    assert (d.touched_sorted <= d.files_sorted).all()


def test_calibration_table_is_reliability_diagram(con):
    d = con.execute(_oracle("purchase_propensity_calibration")).fetchdf()
    assert (d.obs_rate_micro.between(0, 1_000_000)).all()
    assert (d.n_pos <= d.n).all()
    assert (d.gap_micro ==
            (d.mean_score_micro - d.obs_rate_micro).abs()).all()
    # ECE decomposition: per-bin contributions reassemble (floor slack)
    ece = d.ece_contrib_micro.sum()
    direct = (d.n * d.gap_micro).sum() // d.n.sum()
    assert abs(ece - direct) <= len(d)
    # mean score rises with the bin index (score defines the bin)
    assert d.sort_values("bin").mean_score_micro.is_monotonic_increasing


# ---------------------------------------------------------------------------
# batch 19


def test_retention_decays_and_halflife_consistent(con):
    d = con.execute(_oracle("retention_halflife_fit")).fetchdf()
    d = d.sort_values("age_weeks")
    assert d.age_weeks.iloc[0] == 0
    # age 0 is full retention by construction (cohort = first week)
    assert d.rate_micro.iloc[0] == 1_000_000
    assert (d.rate_micro.between(0, 1_000_000)).all()
    assert (d.active_n <= d.eligible_n).all()
    # the same fit rides every row; half-life only exists for decay
    assert d.decay_slope_micro.nunique() == 1
    if d.decay_slope_micro.iloc[0] < 0:
        assert (d.halflife_weeks_micro > 0).all()


def test_seasonal_indices_sum_near_zero(con):
    d = con.execute(_oracle("seasonal_decompose_daily")).fetchdf()
    assert len(d) == 7
    assert set(d.dow) == set(range(7))
    # the decomposition must find SOME weekday structure to report
    # (indices differ across dow), and residual columns are coherent
    assert d.seasonal_micro.nunique() > 1
    assert (d.mean_abs_resid_micro >= 0).all()
    assert (d.max_abs_resid_micro >= d.mean_abs_resid_micro).all()
    # every full-window day contributes exactly once
    assert (d.n_days >= 1).all()


def test_rrf_fuses_both_lists(con):
    d = con.execute(_oracle("rrf_rank_fusion")).fetchdf()
    assert len(d) == 20
    assert d.fused_rank.is_monotonic_increasing
    assert d.rrf_nano.is_monotonic_decreasing
    # the fused head must actually draw on BOTH rankings: top fused
    # customers appear in at least one list, and the two rank columns
    # are not identical orderings
    both = d.dropna(subset=["rank_rev", "rank_cnt"])
    assert len(both) >= 1
    assert not (d.rank_rev.fillna(-1) == d.rank_cnt.fillna(-1)).all()
    # membership in both lists beats a same-rank single-list entry
    top = d.iloc[0]
    assert top.rrf_nano >= int(1e9 / 61)


def test_loop_detector_finds_periodic_runs(con):
    d = con.execute(_oracle("loop_detect_score")).fetchdf()
    assert len(d) == 100
    assert d.best_p.isin([1, 2, 3]).all()
    assert (d.loop_words <= d.n_words).all()
    assert (d.loop_words > d.best_p).all()  # at least one real match
    assert d.loop_score_micro.is_monotonic_decreasing
    # the synthetic corpus contains genuine stutter ("batch batch ...");
    # the top offender must be a non-trivial fraction of its doc
    assert d.loop_score_micro.iloc[0] >= 100_000


def test_quantization_preserves_most_neighbors(con):
    d = con.execute(_oracle("quantization_recall_probe")).fetchdf()
    assert len(d) >= 10
    assert d.n_common.between(0, 5).all()
    assert (d.overlap_micro == d.n_common * 200_000).all()
    # int8 with a per-vector scale is a mild distortion: most probes
    # keep most of their top-5, and at least one keeps all of it
    assert d.n_common.mean() >= 3.0
    assert (d.n_common == 5).any()


def test_yield_curve_monotone_in_threshold(con):
    d = con.execute(_oracle("dedup_yield_curve")).fetchdf()
    d = d.sort_values("threshold")
    assert len(d) == 5
    # tightening the threshold can only shrink pairs and deletions
    assert d.n_pairs.is_monotonic_decreasing
    assert d.docs_dropped.is_monotonic_decreasing
    assert d.words_dropped.is_monotonic_decreasing
    # the planted near-dups must survive to the 0.9 bucket
    assert d.n_pairs.iloc[-1] > 0
    assert (d.docs_dropped <= d.n_pairs).all()
    assert d.doc_frac_micro.between(0, 1_000_000).all()


def test_nrr_decomposition_consistent(con):
    d = con.execute(_oracle("net_revenue_retention")).fetchdf()
    assert len(d) >= 4
    assert (d.retained_customers <= d.base_customers).all()
    # NRR = GRR + expansion, exactly (shared integer-cents numerators,
    # floor slack 2 micros)
    assert ((d.nrr_micro - d.grr_micro - d.expansion_micro).abs()
            <= 2).all()
    assert (d.grr_micro <= 1_000_000).all()
    assert (d.logo_retention_micro.between(0, 1_000_000)).all()


def test_bootstrap_ci_brackets_point_estimate(con):
    d = con.execute(_oracle("bootstrap_ci_conversion")).fetchdf()
    r = d.iloc[0]
    assert r.n_resamples == 100
    # the 95% interval brackets the point estimate and the median
    assert r.ci_lo_micro <= r.point_micro <= r.ci_hi_micro
    assert r.ci_lo_micro <= r.ci_mid_micro <= r.ci_hi_micro
    # Poisson noise is real: the interval has width, but bounded —
    # binomial sd ~ sqrt(p(1-p)/n); 8 sd is a generous envelope
    import math

    p = r.point_micro / 1e6
    sd = math.sqrt(max(p * (1 - p), 1e-9) / r.n_users)
    assert 0 < (r.ci_hi_micro - r.ci_lo_micro) <= 8 * sd * 1e6


def test_cdc_dedup_saves_storage_on_revisions(con):
    d = con.execute(_oracle("cdc_chunk_dedup")).fetchdf()
    r = d.iloc[0]
    assert r.unique_chunks <= r.total_chunks
    # ~1/25 of docs are planted head-edited revisions whose tail chunks
    # realign: CDC must find real duplicate chunks (<97% unique), yet
    # most chunks stay unique on this random-ish corpus
    assert 500_000 <= r.unique_frac_micro <= 970_000
    assert r.min_chunk_words >= 1
    assert r.max_chunk_words >= 8


def test_minhash_error_within_binomial_envelope(con):
    d = con.execute(_oracle("minhash_estimate_error")).fetchdf()
    assert len(d) >= 1
    assert (d.n_pairs > 0).all()
    # 12-hash estimator: sd <= sqrt(0.25/12) ~ 0.144; mean |err| must
    # sit well inside 2 sd and max inside the hard bound of 1
    assert (d.mean_err_micro <= 290_000).all()
    assert (d.max_err_micro <= 1_000_000).all()
