"""Reusable operators: relational building blocks and the
training-data-pipeline extensions (dedup, similarity, text,
multimodal) — SURVEY.md §2.11 / BASELINE.json north-star."""
