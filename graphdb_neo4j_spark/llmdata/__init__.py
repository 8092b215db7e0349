"""LLM-training-data pipeline operators (beyond the reference surface):
deduplication, similarity search, text analysis, multimodal plumbing —
each designed for the 100 TB shape (token equi-joins, banded LSH candidate
generation, no driver-side loops over rows)."""
