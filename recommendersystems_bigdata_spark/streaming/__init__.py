"""Structured Streaming operators (SURVEY.md §2.I i5–i7)."""
