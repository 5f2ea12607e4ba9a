"""File-format conversion operators (SURVEY.md §2.5)."""
