"""CDC + training-data operators (SURVEY.md §2 re-expressed Spark-first)."""
