"""Similarity search over embedding columns."""
