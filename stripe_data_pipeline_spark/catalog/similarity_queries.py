"""Similarity-search extension queries — populated incrementally."""
