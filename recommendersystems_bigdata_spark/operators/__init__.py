"""Relational operator queries (SURVEY.md §2.A–§2.I)."""
