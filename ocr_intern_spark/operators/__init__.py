"""Distributed operators: extraction pipeline, dedup, similarity,
analytics."""
