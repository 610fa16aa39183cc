"""Source/sink connectors beyond the parquet catalog (SURVEY.md §2.A)."""
