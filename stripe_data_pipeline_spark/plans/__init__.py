"""Pipeline runner + analyst query entry points (SURVEY.md §3)."""
