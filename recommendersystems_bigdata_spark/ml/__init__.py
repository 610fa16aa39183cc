"""ML / recommender / LLM-data-pipeline operators (SURVEY.md §2.K)."""
