"""LLM-data-pipeline operators: dedup, similarity search, multimodal."""
