"""Text-analysis and dedup extension queries — populated incrementally."""
