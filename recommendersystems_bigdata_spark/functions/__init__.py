"""Scalar function and UDF operator queries (SURVEY.md §2.H, §2.J)."""
