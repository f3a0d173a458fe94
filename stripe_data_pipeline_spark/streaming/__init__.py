"""Structured Streaming variants (SURVEY.md §2.10)."""
