"""Scalar/vector function library for large-scale training-data pipelines."""
