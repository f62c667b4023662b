"""Scalar function library — native Catalyst column expressions."""
