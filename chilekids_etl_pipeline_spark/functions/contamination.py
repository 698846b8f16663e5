"""Shared contamination-screen SQL builders.

Lives in functions/ (not plans/) deliberately: plan modules register
catalog entries at import time and registry insertion order is the
external correctness gate's sampling window, so a template shared
between plan modules must not force one to import another
(tests/test_registry_order.py).
"""

from __future__ import annotations

from .text import shingles_sql, words_sql

BENCH_GRAM_N = 8


def bench_grams_cte(dialect: str, n: int = BENCH_GRAM_N) -> str:
    """The 'benchmark' eval set: distinct n-grams of every 97th doc —
    standing in for the published eval suites a real pipeline screens
    against."""
    grams = shingles_sql(dialect, words_sql(dialect), n)
    mod = "cast(doc_id AS int) % 97 = 0"
    if dialect == "spark":
        return f"SELECT DISTINCT explode({grams}) AS g FROM documents WHERE {mod}"
    return f"SELECT DISTINCT unnest({grams}) AS g FROM documents WHERE {mod}"
