"""Training-data pipeline operators (SURVEY.md §2.J/§2.K + the
100 TB LLM-data extensions: dedup, similarity search, multimodal
columns, text analysis)."""
