"""Deduplication operators: blocking, candidate pairs, Dis-Dedup
load-balanced pair generation, comparators, and near-dup variants."""
