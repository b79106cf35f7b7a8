"""Scalar function library: similarity comparators, text analysis, vectors."""
