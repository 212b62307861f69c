"""Operators: top-k similarity search, dedup family, text analysis,
relational analytics, ANN index, multimodal plumbing."""
