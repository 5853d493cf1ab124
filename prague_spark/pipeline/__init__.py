"""LLM-data-pipeline operators (greenfield, beyond the reference surface):
dedup, similarity search, text analysis, multimodal columns."""
