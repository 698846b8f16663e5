"""LLM-training-data operators (#19-30 in SURVEY.md §2) — filled in
incrementally: dedup, similarity search, text analysis, multimodal."""

from __future__ import annotations
