"""Scalar / batched kernel library (SURVEY §2.8)."""
