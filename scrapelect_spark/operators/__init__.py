"""Spark DataFrame-level operators: scrp extraction, dedup families,
similarity search, text analysis, multimodal plumbing."""
