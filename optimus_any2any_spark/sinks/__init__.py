"""Sink components (SURVEY.md §2.2)."""
