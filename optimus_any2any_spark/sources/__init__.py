"""Source components (SURVEY.md §2.1)."""
