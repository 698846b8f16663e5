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
