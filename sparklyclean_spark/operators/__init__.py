"""Operator library: relational core, dedup, similarity, text, windows."""
